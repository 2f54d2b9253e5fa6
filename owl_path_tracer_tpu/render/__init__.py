from . import film, integrator  # noqa: F401
