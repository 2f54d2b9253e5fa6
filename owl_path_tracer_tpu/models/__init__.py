from . import camera, material, scene  # noqa: F401
