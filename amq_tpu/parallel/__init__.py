from . import tp  # noqa: F401
from .tp import make_mesh, make_tp_forward, shard_params  # noqa: F401
