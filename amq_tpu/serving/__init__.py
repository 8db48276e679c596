from .engine import ContinuousBatcher, Engine, Request, pallas_linear_impl  # noqa: F401
