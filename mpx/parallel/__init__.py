from mpx.parallel.mesh import default_mesh
from mpx.parallel.sharding import run_jobs_sharded

__all__ = ["default_mesh", "run_jobs_sharded"]
