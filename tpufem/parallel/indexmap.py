"""Owned/ghost index maps for SPMD shards.

Equivalent of ``dolfinx::common::IndexMap`` + ``common::Scatterer``
(reference: owned+ghost dof partition seen at src/main.cpp:179-180,
explicit pack -> MPI -> unpack ghost exchange at
src/cgpoisson_problem.cpp:185-230).  TPU-native differences:

- ownership and exchange tables are computed ONCE on the host with
  global knowledge (the partitioner analogue), then baked into static
  padded arrays — every shard has identical shapes (shard_map needs
  static shapes);
- the exchange itself is a ``jax.lax.ppermute`` shift over the mesh
  axis (ICI neighbor traffic): a z-slab decomposition has only +/-1
  neighbors, so 'rev' (accumulate ghost contributions into owners) and
  'fwd' (refresh ghost copies) are each ONE ppermute.

Local vector layout per shard: [max_owned | max_ghost] with zero padding;
``owned_mask`` selects real owned entries (used to mask global dots).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ShardIndexMaps:
    """Stacked per-shard index data ([S, ...] arrays, zero-padded)."""

    nshards: int
    max_owned: int
    max_ghost: int
    nlocal: int                    # = max_owned + max_ghost
    local_gids: np.ndarray         # [S, nlocal] global dof of each slot (pad 0)
    owned_counts: np.ndarray       # [S]
    ghost_counts: np.ndarray       # [S]
    owned_mask: np.ndarray         # [S, nlocal] bool
    ghost_mask: np.ndarray         # [S, max_ghost] bool
    share_idx: np.ndarray          # [S, max_ghost] local slots ghosted by s+1
    share_mask: np.ndarray         # [S, max_ghost] bool

    def local_of_global(self, shard: int, gids: np.ndarray) -> np.ndarray:
        """Map global dof ids to this shard's local slots."""
        lg = self.local_gids[shard]
        n_own = self.owned_counts[shard]
        n_gh = self.ghost_counts[shard]
        own = lg[:n_own]
        gh = lg[self.max_owned: self.max_owned + n_gh]
        out = np.empty(gids.shape, dtype=np.int64)
        pos_own = np.searchsorted(own, gids)
        pos_own_c = np.clip(pos_own, 0, max(n_own - 1, 0))
        is_own = own[pos_own_c] == gids if n_own else np.zeros(gids.shape, bool)
        out[is_own] = pos_own_c[is_own]
        rest = ~is_own
        if rest.any():
            pos_gh = np.searchsorted(gh, gids[rest])
            pos_gh_c = np.clip(pos_gh, 0, max(n_gh - 1, 0))
            if n_gh == 0 or not bool((gh[pos_gh_c] == gids[rest]).all()):
                raise ValueError("gid not present on shard")
            out[rest] = self.max_owned + pos_gh_c
        return out

    def distribute(self, x_global: np.ndarray) -> np.ndarray:
        """[S, nlocal] per-shard local vectors from a global vector."""
        out = np.zeros((self.nshards, self.nlocal), dtype=x_global.dtype)
        for s in range(self.nshards):
            n_own, n_gh = self.owned_counts[s], self.ghost_counts[s]
            out[s, :n_own] = x_global[self.local_gids[s, :n_own]]
            sl = slice(self.max_owned, self.max_owned + n_gh)
            out[s, sl] = x_global[self.local_gids[s, sl]]
        return out

    def collect(self, x_local: np.ndarray, ndofs: int) -> np.ndarray:
        """Global vector from per-shard locals (owned entries only)."""
        out = np.zeros(ndofs, dtype=x_local.dtype)
        for s in range(self.nshards):
            n_own = self.owned_counts[s]
            out[self.local_gids[s, :n_own]] = x_local[s, :n_own]
        return out


def build_index_maps(cell_dofs_per_shard: List[np.ndarray]) -> ShardIndexMaps:
    """Construct index maps from each shard's global cell-dof arrays.

    Ownership: lowest shard index referencing a dof (deterministic,
    communication-free at runtime).  Ghost lists and the matching 'share'
    lists are both sorted by global id, so a single ppermute shift aligns
    sender and receiver slots.  Assumes neighbor-only coupling (slab
    decomposition): every ghost is owned by shard s-1 (validated).
    """
    S = len(cell_dofs_per_shard)
    locals_ = [np.unique(cd.reshape(-1)) for cd in cell_dofs_per_shard]
    # owner = min shard referencing
    all_gids = np.concatenate(locals_)
    all_shard = np.concatenate([np.full(l.shape, s, dtype=np.int64)
                                for s, l in enumerate(locals_)])
    order = np.lexsort((all_shard, all_gids))
    g_sorted = all_gids[order]
    s_sorted = all_shard[order]
    first = np.concatenate([[True], np.diff(g_sorted) > 0])
    owner_gids = g_sorted[first]
    owner_shard = s_sorted[first]  # min shard per gid (lexsort order)

    owned = []
    ghosts = []
    for s in range(S):
        pos = np.searchsorted(owner_gids, locals_[s])
        own_mask = owner_shard[pos] == s
        owned.append(locals_[s][own_mask])
        g = locals_[s][~own_mask]
        if not bool(np.all(np.isin(owner_shard[np.searchsorted(owner_gids, g)],
                                   [s - 1]))):
            raise ValueError("non-neighbor ghost coupling; slab decomposition "
                             "requires ghosts owned by shard s-1")
        ghosts.append(g)

    max_owned = max(o.shape[0] for o in owned)
    max_ghost = max((g.shape[0] for g in ghosts), default=0)
    max_ghost = max(max_ghost, 1)
    nlocal = max_owned + max_ghost

    local_gids = np.zeros((S, nlocal), dtype=np.int64)
    owned_counts = np.array([o.shape[0] for o in owned])
    ghost_counts = np.array([g.shape[0] for g in ghosts])
    owned_mask = np.zeros((S, nlocal), dtype=bool)
    ghost_mask = np.zeros((S, max_ghost), dtype=bool)
    share_idx = np.zeros((S, max_ghost), dtype=np.int64)
    share_mask = np.zeros((S, max_ghost), dtype=bool)

    for s in range(S):
        no, ng = owned_counts[s], ghost_counts[s]
        local_gids[s, :no] = owned[s]
        local_gids[s, max_owned: max_owned + ng] = ghosts[s]
        owned_mask[s, :no] = True
        ghost_mask[s, :ng] = True
        # share list of shard s = ghosts of shard s+1 (owned here); both
        # sorted by gid so slot k pairs with ghost slot k downstream
        if s + 1 < S:
            gh_next = ghosts[s + 1]
            pos = np.searchsorted(owned[s], gh_next)
            if gh_next.size and not bool(
                    np.all(owned[s][np.clip(pos, 0, no - 1)] == gh_next)):
                raise ValueError("downstream ghost not owned by this shard")
            share_idx[s, :gh_next.shape[0]] = pos
            share_mask[s, :gh_next.shape[0]] = True

    return ShardIndexMaps(
        nshards=S, max_owned=max_owned, max_ghost=max_ghost, nlocal=nlocal,
        local_gids=local_gids, owned_counts=owned_counts,
        ghost_counts=ghost_counts, owned_mask=owned_mask,
        ghost_mask=ghost_mask, share_idx=share_idx, share_mask=share_mask)


# ---------------------------------------------------------------------------
# In-shard_map exchange primitives (traced per shard; axis name "shard")
# ---------------------------------------------------------------------------


def scatter_rev_add(y: jnp.ndarray, share_idx: jnp.ndarray,
                    share_mask: jnp.ndarray, max_owned: int,
                    axis: str = "shard") -> jnp.ndarray:
    """Accumulate ghost contributions into their owners (the
    ``scatter_rev(plus)`` analogue, reference poisson_problem.cpp:154):
    ghost block -> ppermute shift to s-1 -> masked add at share slots."""
    S = jax.lax.axis_size(axis)
    ghost_block = y[max_owned:]
    perm = [(s, s - 1) for s in range(1, S)]
    recv = jax.lax.ppermute(ghost_block, axis, perm)  # from s+1 (zeros at edge)
    y = y.at[share_idx].add(jnp.where(share_mask, recv, 0.0))
    # at-index 0 padding may have accumulated garbage zeros only (masked)
    return y


def scatter_fwd(y: jnp.ndarray, share_idx: jnp.ndarray,
                share_mask: jnp.ndarray, ghost_mask: jnp.ndarray,
                max_owned: int, axis: str = "shard") -> jnp.ndarray:
    """Refresh ghost copies from owners (the ``scatter_fwd`` analogue,
    reference cgpoisson_problem.cpp:224-229)."""
    S = jax.lax.axis_size(axis)
    share_vals = jnp.where(share_mask, y[share_idx], 0.0)
    perm = [(s, s + 1) for s in range(S - 1)]
    recv = jax.lax.ppermute(share_vals, axis, perm)  # from s-1
    return y.at[max_owned:].set(jnp.where(ghost_mask, recv, 0.0))


def masked_dot(a: jnp.ndarray, b: jnp.ndarray, owned_mask: jnp.ndarray,
               axis: str = "shard") -> jnp.ndarray:
    """Global inner product over owned entries (the allreduce inside CG,
    reference src/cg.h:53,65)."""
    acc = a.astype(jnp.float64) if a.dtype == jnp.float32 and \
        jax.config.jax_enable_x64 else a
    bcc = b.astype(acc.dtype)
    local = jnp.sum(jnp.where(owned_mask, acc * bcc, 0.0))
    return jax.lax.psum(local, axis)
