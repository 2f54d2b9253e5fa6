"""owl_path_tracer_tpu -- a TPU-native differentiable wavefront path tracer.

A from-scratch JAX/Pallas rebuild of the capabilities of the CUDA/OptiX
reference ``jctemp/owl-path-tracer``: 5-lobe Disney BSDF, JSON/OBJ scene
pipeline, emissive + environment lighting, material parameter sweeps -- plus
the pieces the reference left dead or missing: live NEE/MIS, BVH construction
and traversal (no RT cores here), end-to-end differentiability, progressive
checkpointed rendering, and multi-chip sharding over a ``jax.sharding.Mesh``.
"""
from .version import __version__  # noqa: F401


def _enable_compilation_cache():
    """Persistent XLA compilation cache: renders recompile across processes
    otherwise (first dragon compile is ~80s on the TPU tunnel)."""
    import os

    try:
        # 1M-triangle scenes (dragon8: K~2.7k clusters at C=512) need ~18 MB
        # of kernel scratch; the default scoped-vmem budget is 16 MB.  Must be
        # set before JAX backend init (import owl_path_tracer_tpu before any
        # jax.devices()/jit call); respected by the axon relay's compile env.
        # APPEND to any user-set LIBTPU_INIT_ARGS rather than skipping the
        # bump whenever the variable already holds unrelated flags.
        _flag = "--xla_tpu_scoped_vmem_limit_kib"
        _cur = os.environ.get("LIBTPU_INIT_ARGS", "")
        if _flag not in _cur:
            os.environ["LIBTPU_INIT_ARGS"] = (
                _cur + " " if _cur else ""
            ) + f"{_flag}=24576"
        import jax

        cache_dir = os.environ.get(
            "OWLPT_COMPILE_CACHE", os.path.expanduser("~/.cache/owlpt_xla")
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()
