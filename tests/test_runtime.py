import numpy as np

from mpx.runtime import DeviceContext, devices


def test_device_context_roundtrip():
    ctx = DeviceContext()
    x = np.arange(16, dtype=np.float32)
    d = ctx.to_device(x)
    ns = ctx.finish(d)
    assert ns >= 0
    np.testing.assert_array_equal(ctx.to_host(d), x)
    assert ctx.platform in ("cpu", "tpu", "axon")
    assert len(devices()) >= 1
