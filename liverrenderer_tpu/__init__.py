"""liverrenderer_tpu — a TPU-native differentiable renderer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
mmigas/LiverRenderer (a Mitsuba 3 fork specialized for biophysical liver
rendering): wavefront path tracing, volumetric transport with the layered
liver media, learned subsurface scattering, and radiative-backprop
differentiable rendering — built on SoA scene pytrees, jit/scan wavefront
loops, and jax.sharding for multi-chip scaling.

Facade mirrors the pieces of the `mitsuba` Python API the liver pipeline
uses: load_dict / load_file / render / cornell_box / traverse / Bitmap-ish IO.
"""

from .scene.builder import load_dict
from .scene.cornell import cornell_box
from .scene.transform import Transform
from .scene.xml import load_file
from .integrators.common import render
from .integrators.regen import RenderControl
from .integrators.prb import render_grad, render_fwd_grad
from .integrators.aux import (render_aovs, render_depth, render_direct,
                              render_moments)
from .integrators.ptracer import render_ptracer
from .integrators.spectral import render_specfilm
from .integrators.stokes import render_stokes
from .util import traverse, apply_params, SceneParameters
from .largesteps import LargeSteps
from .io.image import read_image, write_image

__version__ = "0.1.0"

__all__ = [
    "load_dict", "load_file", "cornell_box", "Transform", "render",
    "render_grad", "render_fwd_grad", "render_aovs", "render_depth",
    "render_direct", "render_moments", "render_ptracer", "render_stokes",
    "traverse",
    "apply_params", "SceneParameters", "LargeSteps", "read_image",
    "write_image",
]
