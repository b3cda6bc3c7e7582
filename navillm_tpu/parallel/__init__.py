from .mesh import MeshPlan, make_mesh, shard_params, replicated, nav_param_specs
