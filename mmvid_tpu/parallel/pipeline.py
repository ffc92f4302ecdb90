"""Pipeline-parallel utilities for the backbone transformer stack.

The reference has data parallelism only (SURVEY.md §2.3); this module is
beyond-parity TPU work: a GPipe-style microbatched pipeline over a ``pp``
mesh axis, built the GSPMD way — no hand-written send/recv.  The stacked
block parameters carry a leading ``[layers]`` axis sharded over ``pp``;
each schedule tick runs every stage in parallel (a ``vmap`` over the
pp-sharded stage axis) and the inter-stage shift is a concatenate on that
sharded axis, which XLA lowers to a ``collective-permute`` over ICI.

Layout conversion: the sequential ``TransformerStack`` stores per-block
subtrees ``blocks_0..blocks_{L-1}`` (the layout every torch-checkpoint
converter produces); the pipelined stack stores ONE pytree ``blocks`` whose
leaves have a leading layer axis.  ``stack_block_params`` /
``unstack_block_params`` convert between them.  On-disk convention:
native orbax checkpoints (``weights/<iter>``) store whatever layout the
run trained in (stacked for pp runs — params AND Adam moments stay
consistent, and both loaders adapt via ``adapt_stack_layout`` /
``adapt_opt_state_layout``); only ``dalle.pt`` *exports*
(``torch_compat.save_dalle_checkpoint``) are always converted to the
reference's per-block layout.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def ambient_mesh() -> Optional[Any]:
    """The mesh currently in context (``with mesh:`` or ``jax.set_mesh``),
    or None.  Read at trace time — inside-jit abstract meshes are empty in
    this jax version, but tracing happens under the caller's context."""
    try:
        m = jax.sharding.get_abstract_mesh()
        if m is not None and not m.empty:
            return m
    except Exception:
        pass
    # ``with mesh:`` (the legacy resource env) — jax 0.9 exposes it only
    # through thread_resources; prefer the private home and fall back to
    # the deprecated jax.interpreters.pxla re-export ONLY if that import
    # fails (older jax), so no DeprecationWarning in normal operation.
    try:
        m = (__import__('jax._src.mesh', fromlist=['mesh'])
             .thread_resources.env.physical_mesh)
    except Exception:
        try:
            from jax.interpreters import pxla
            m = pxla.thread_resources.env.physical_mesh
        except Exception:
            m = None
    if m is not None and not m.empty:
        return m
    return None


def maybe_constrain(x: jax.Array, *axes: Optional[Sequence[str]]):
    """``with_sharding_constraint(x, P(*axes))`` if every named axis exists
    in the ambient mesh; no-op otherwise (single-host tests, no mesh).

    Each element of ``axes`` is an axis name, None, or a tuple of names.
    """
    mesh = ambient_mesh()
    if mesh is None:
        return x
    names = set(mesh.axis_names)

    def known(a) -> bool:
        if a is None:
            return True
        if isinstance(a, (tuple, list)):
            return all(n in names for n in a)
        return a in names

    if not all(known(a) for a in axes):
        return x
    return jax.lax.with_sharding_constraint(x, P(*axes))


# ---------------------------------------------------------------------------
# Per-block <-> stacked parameter layout
# ---------------------------------------------------------------------------

def stack_block_params(tparams: dict, layers: int) -> dict:
    """Convert a sequential TransformerStack param tree
    ``{'blocks_0': {...}, ..., 'blocks_{L-1}': {...}}`` into the pipelined
    layout ``{'blocks': tree-with-leading-[L]-axis}``.  Non-block entries
    are passed through."""
    blocks = [tparams[f'blocks_{i}'] for i in range(layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    rest = {k: v for k, v in tparams.items()
            if not k.startswith('blocks_')}
    return {**rest, 'blocks': stacked}


def unstack_block_params(tparams: dict, layers: int) -> dict:
    """Inverse of :func:`stack_block_params` (for writing
    reference-format checkpoints from a pipelined model)."""
    stacked = tparams['blocks']
    out = {k: v for k, v in tparams.items() if k != 'blocks'}
    for i in range(layers):
        out[f'blocks_{i}'] = jax.tree_util.tree_map(
            lambda a, i=i: a[i], stacked)
    return out


def adapt_stack_layout(params: dict, layers: int,
                       pipelined: bool) -> dict:
    """Convert a full BertCore param tree's ``transformer`` subtree to the
    requested layout, if it isn't already in it."""
    t = params.get('transformer')
    if t is None:
        return params
    if pipelined and 'blocks' not in t and 'blocks_0' in t:
        return {**params, 'transformer': stack_block_params(t, layers)}
    if not pipelined and 'blocks' in t:
        return {**params, 'transformer': unstack_block_params(t, layers)}
    return params
