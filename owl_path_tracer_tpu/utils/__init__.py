from . import image, obj, parser  # noqa: F401
