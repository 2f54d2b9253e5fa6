"""owl_path_tracer_tpu -- a TPU-native differentiable wavefront path tracer.

A from-scratch JAX/Pallas rebuild of the capabilities of the CUDA/OptiX
reference ``jctemp/owl-path-tracer``: 5-lobe Disney BSDF, JSON/OBJ scene
pipeline, emissive + environment lighting, material parameter sweeps -- plus
the pieces the reference left dead or missing: live NEE/MIS, BVH construction
and traversal (no RT cores here), end-to-end differentiability, progressive
checkpointed rendering, and multi-chip sharding over a ``jax.sharding.Mesh``.
"""
from .version import __version__  # noqa: F401
