"""Scene geometry tree → compiled span evaluator.

The reference walks a heap-allocated ``Object`` tree and builds a private
virtual ``SpanIterator`` tree per render thread
(``/root/reference/include/object.h:10-24``, ``src/test.cpp:503``).  Here
the tree is *compiled once*: leaf parameters land in SoA arrays inside a
params pytree (so they are differentiable leaves), the CSG structure
becomes a static evaluation plan unrolled at trace time, and nested unions
collapse into single n-ary event merges.

Transforms
----------
``Transformed(obj, A)`` is the object mapped by ``x → A x``.  Rays are
pulled into object space with ``A⁻¹`` and boundary normals pushed back with
``A⁻ᵀ`` (the correct normal map).  The reference's ``TransformedObject``
instead transforms the *ray* forward by its matrix and normals by the plain
inverse (object.h:45-70) — under that convention ``transform(m, obj)``
actually yields the object transformed by ``m⁻¹``, and non-uniform scales
shear normals incorrectly; both quirks are unexercised by the reference
demo (its only transforms target materials), so we implement the standard
semantics.  ``t`` parameterization is unchanged by affine maps, so span
arithmetic commutes with transforms.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax.numpy as jnp

from ptx.core import linalg
from ptx.geom import primitives, spans


# ---------------------------------------------------------------------------
# user-facing geometry tree
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Sphere:
    center: Any                 # (3,)
    radius: Any                 # scalar
    material: Any               # Material (see ptx.shade.materials)


@dataclasses.dataclass(frozen=True)
class Plane:
    """Half-space ``normal·x + d <= 0``.  ``from_point`` mirrors the
    reference's point constructor ``d = −normal·pos`` (plane.cpp:11-13)."""
    normal: Any                 # (3,)
    d: Any                      # scalar
    material: Any

    @staticmethod
    def from_point(normal, point, material) -> "Plane":
        n = np.asarray(normal, np.float32)
        p = np.asarray(point, np.float32)
        return Plane(normal=n, d=float(-np.dot(n, p)), material=material)


@dataclasses.dataclass(frozen=True)
class Union:
    objects: tuple

    def __init__(self, *objects):
        object.__setattr__(self, "objects", tuple(objects))


@dataclasses.dataclass(frozen=True)
class Intersection:
    objects: tuple

    def __init__(self, *objects):
        object.__setattr__(self, "objects", tuple(objects))


@dataclasses.dataclass(frozen=True)
class Difference:
    a: Any
    b: Any


@dataclasses.dataclass(frozen=True)
class Transformed:
    obj: Any
    transform: Any              # (3, 4) affine


# ---------------------------------------------------------------------------
# compilation
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class GeometryParams:
    """Numpy staging of the differentiable geometry leaves."""
    sphere_center: list
    sphere_radius: list
    plane_normal: list
    plane_d: list
    xform: list                 # (3, 4) affine per Transformed node


class _Plan:
    """A node of the static evaluation plan."""
    pass


@dataclasses.dataclass
class _LeafPlan(_Plan):
    kind: str                   # "sphere" | "plane"
    index: int
    mat_id: int
    xform_chain: tuple          # indices into params["xform"], outermost first


@dataclasses.dataclass
class _OpPlan(_Plan):
    op: str                     # "union" | "intersection" | "difference"
    children: tuple


def compile_geometry(root, material_ids: dict):
    """Flatten the tree.  Returns ``(params_dict, eval_fn)`` where
    ``eval_fn(params, origin, direction) -> SpanList`` and ``params`` holds
    the differentiable geometry leaves.

    ``material_ids`` maps material objects (by id()) to table indices —
    assigned by the material-table compiler.
    """
    staged = GeometryParams([], [], [], [], [])

    def walk(node, chain):
        if isinstance(node, Transformed):
            staged.xform.append(np.asarray(node.transform, np.float32).reshape(3, 4))
            return walk(node.obj, chain + (len(staged.xform) - 1,))
        if isinstance(node, Sphere):
            staged.sphere_center.append(np.asarray(node.center, np.float32).reshape(3))
            staged.sphere_radius.append(np.float32(node.radius))
            return _LeafPlan("sphere", len(staged.sphere_radius) - 1,
                             material_ids[id(node.material)], chain)
        if isinstance(node, Plane):
            staged.plane_normal.append(np.asarray(node.normal, np.float32).reshape(3))
            staged.plane_d.append(np.float32(node.d))
            return _LeafPlan("plane", len(staged.plane_d) - 1,
                             material_ids[id(node.material)], chain)
        if isinstance(node, Union):
            kids = []
            # collapse nested unions into one n-ary merge (the reference's
            # balanced binary unionArray tree, test.cpp:52-64, is a log-N
            # cascade of two-stream merges; one event pass replaces it)
            def gather(u):
                for c in u.objects:
                    if isinstance(c, Union):
                        gather(c)
                    else:
                        kids.append(walk(c, chain))
            gather(node)
            return _OpPlan("union", tuple(kids))
        if isinstance(node, Intersection):
            return _OpPlan("intersection",
                           tuple(walk(c, chain) for c in node.objects))
        if isinstance(node, Difference):
            return _OpPlan("difference",
                           (walk(node.a, chain), walk(node.b, chain)))
        raise TypeError(f"unknown scene node {type(node)!r}")

    plan = walk(root, ())

    params = {
        "sphere_center": jnp.asarray(np.array(staged.sphere_center, np.float32).reshape(-1, 3)),
        "sphere_radius": jnp.asarray(np.array(staged.sphere_radius, np.float32).reshape(-1)),
        "plane_normal": jnp.asarray(np.array(staged.plane_normal, np.float32).reshape(-1, 3)),
        "plane_d": jnp.asarray(np.array(staged.plane_d, np.float32).reshape(-1)),
        "xform": jnp.asarray(np.array(staged.xform, np.float32).reshape(-1, 3, 4)),
    }

    def eval_plan(node, params, origin, direction):
        if isinstance(node, _LeafPlan):
            o, d = origin, direction
            if node.xform_chain:
                w = params["xform"][node.xform_chain[0]]
                for i in node.xform_chain[1:]:
                    w = linalg.compose(w, params["xform"][i])
                w_inv = linalg.inverse(w)
                o, d = linalg.transform_ray(w_inv, o, d)
                nrm_mat = jnp.transpose(w_inv[:, :3])  # A^{-T}
            else:
                nrm_mat = None
            if node.kind == "sphere":
                sl = primitives.sphere_spans(
                    o, d, params["sphere_center"][node.index],
                    params["sphere_radius"][node.index], node.mat_id)
            else:
                sl = primitives.plane_spans(
                    o, d, params["plane_normal"][node.index],
                    params["plane_d"][node.index], node.mat_id)
            if nrm_mat is not None:
                sl = spans.transform_normals(sl, nrm_mat)
            return sl
        kids = [eval_plan(c, params, origin, direction) for c in node.children]
        if node.op == "union":
            return spans.union(*kids)
        if node.op == "intersection":
            return spans.intersection(*kids)
        return spans.difference(kids[0], kids[1])

    def eval_fn(params, origin, direction):
        return eval_plan(plan, params, origin, direction)

    return params, eval_fn, plan
