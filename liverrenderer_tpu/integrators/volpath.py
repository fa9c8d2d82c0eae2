"""Volumetric path tracer (placeholder — implemented with the media layer).

Will mirror reference src/integrators/volpath.cpp + the fork's biovolpath
(tissueDepth threading, biovolpath.cpp:129-273).
"""
from __future__ import annotations


def sample(scene, sampler, ray, mode="primal"):
    raise NotImplementedError("volpath lands with the media layer")
