"""Disney material table as an SoA pytree.

Mirrors ``material_data`` (``/root/reference/path_tracer/src/device/device_global.hpp:19-36``)
-- 15 parameters incl. the parsed-but-unused ``subsurface`` -- but stored as
struct-of-arrays so the whole wavefront gathers its surface parameters with one
take per field.  The same pytree is the leaf the differentiable renderer takes
gradients with respect to (material recovery, BASELINE.json config 5).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.parser import MATERIAL_SCALAR_FIELDS, MaterialDesc


class Materials(NamedTuple):
    """All fields are [M] (or [M,3] for base_color), f32."""

    base_color: jnp.ndarray
    subsurface: jnp.ndarray
    metallic: jnp.ndarray
    specular: jnp.ndarray
    specular_tint: jnp.ndarray
    roughness: jnp.ndarray
    anisotropic: jnp.ndarray
    sheen: jnp.ndarray
    sheen_tint: jnp.ndarray
    clearcoat: jnp.ndarray
    clearcoat_gloss: jnp.ndarray
    ior: jnp.ndarray
    specular_transmission: jnp.ndarray
    specular_transmission_roughness: jnp.ndarray
    emission: jnp.ndarray

    def gather(self, idx: jnp.ndarray) -> "Materials":
        """Per-ray material fetch; idx [N] i32 (clipped by caller if needed)."""
        return jax.tree.map(lambda a: a[idx], self)

    @property
    def count(self) -> int:
        return self.base_color.shape[0]


def from_descs(descs: list[MaterialDesc]) -> Materials:
    base = np.asarray([d.base_color for d in descs], np.float32).reshape(-1, 3)
    cols = {
        k: np.asarray([d.params[k] for d in descs], np.float32)
        for k in MATERIAL_SCALAR_FIELDS
    }
    return Materials(base_color=jnp.asarray(base), **{k: jnp.asarray(v) for k, v in cols.items()})


def single(**overrides) -> Materials:
    """One default material (device_global.hpp defaults) with overrides -- test helper."""
    from ..utils.parser import MATERIAL_DEFAULTS

    vals = dict(MATERIAL_DEFAULTS)
    vals.update(overrides)
    base = np.asarray([vals["base_color"]], np.float32)
    return Materials(
        base_color=jnp.asarray(base),
        **{
            k: jnp.asarray([float(vals[k])], jnp.float32)
            for k in MATERIAL_SCALAR_FIELDS
        },
    )
