"""Scene parameter traversal for inverse rendering.

Functional analog of mi.traverse / SceneParameters (reference
src/python/python/util.py:10): instead of registering traversal callbacks on
C++ objects, the Scene *is* a pytree, so "traversal" is just selecting
differentiable leaves.  `SceneParameters` provides the reference's
dict-of-parameters UX (keys, getitem, update) on top of a functional
`apply` that returns a new Scene.

Key vocabulary (differentiable leaves):
  bsdfs.params, textures.data, textures.bitmaps, emitters.params,
  media.params, vertices
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from .scene.ir import Scene

# leaf key -> (getter, setter)
_LEAVES: Dict[str, tuple] = {
    "bsdfs.params": (lambda s: s.bsdfs.params,
                     lambda s, v: s.replace(bsdfs=s.bsdfs.replace(params=v))),
    "textures.data": (lambda s: s.textures.data,
                      lambda s, v: s.replace(
                          textures=s.textures.replace(data=v))),
    "textures.bitmaps": (lambda s: s.textures.bitmaps,
                         lambda s, v: s.replace(
                             textures=s.textures.replace(bitmaps=v))),
    "emitters.params": (lambda s: s.emitters.params,
                        lambda s, v: s.replace(
                            emitters=s.emitters.replace(params=v))),
    "media.params": (lambda s: s.media.params,
                     lambda s, v: s.replace(media=s.media.replace(params=v))),
    "media.grids": (lambda s: s.media.grids,
                    lambda s, v: s.replace(media=s.media.replace(grids=v))),
    "vertices": (lambda s: s.vertices,
                 lambda s, v: s.replace(vertices=v)),
}


class SceneParameters:
    """Mutable dict-like view over a Scene's differentiable leaves
    (mi.SceneParameters analog).  Call .scene() to materialize."""

    def __init__(self, scene: Scene, keys=None):
        self._scene = scene
        self._data = {k: _LEAVES[k][0](scene)
                      for k in (keys or _LEAVES.keys())}

    def keys(self):
        return self._data.keys()

    def items(self):
        return self._data.items()

    def __getitem__(self, k):
        return self._data[k]

    def __setitem__(self, k, v):
        self._data[k] = jnp.asarray(v, jnp.float32)

    def __contains__(self, k):
        return k in self._data

    def update(self, other: Dict[str, Any] | None = None):
        """Apply pending values (reference params.update() semantics)."""
        if other:
            for k, v in other.items():
                self[k] = v
        self._scene = apply_params(self._scene, self._data)
        return self._scene

    def scene(self) -> Scene:
        return apply_params(self._scene, self._data)

    def as_dict(self) -> Dict[str, jax.Array]:
        return dict(self._data)


def traverse(scene: Scene, keys=None) -> SceneParameters:
    return SceneParameters(scene, keys)


def apply_params(scene: Scene, params: Dict[str, Any]) -> Scene:
    """Functional parameter substitution: new Scene with leaves replaced."""
    for k, v in params.items():
        scene = _LEAVES[k][1](scene, jnp.asarray(v, jnp.float32))
    return scene
