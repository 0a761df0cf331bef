from .mesh import make_mesh, make_mesh_2d, sharded_commit, sharded_gk_total, sharded_msm  # noqa: F401
