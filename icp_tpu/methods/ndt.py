"""NDT scan matching (net-new method family — not in the reference).

The Normal Distributions Transform (Biber & Strasser 2003 for 2D;
Magnusson 2009 for 3D, "point-to-distribution" P2D-NDT) voxelizes the
TARGET into per-cell Gaussians once, then registers the source by
maximizing the likelihood of the transformed points under those Gaussians:

    score(T) = sum_i exp(-0.5 (T a_i - mu_{c(i)})^T  Sigma_{c(i)}^{-1} (T a_i - mu_{c(i)}))

No per-iteration nearest-neighbor search at all — correspondence is an
exact cell-key lookup into the precomputed table (:mod:`icp_tpu.ops.ndt`),
which makes NDT the cheapest per-iteration method in the registry at
large target sizes (the V-slot Gaussian table is far smaller than the
M-point cloud) and the classic choice for scan-to-map localization
against persistent maps.  On TPU the lookup is a dense one-hot matmul
(measured 2.9 ms vs the 3.1 ms brute NN reduce and 15.9 ms for the
gather formulation at the 64k-map bench shape — BASELINE.md "Grid NN").
The reference library has no NDT; its five methods are all point-to-point
(``/root/reference/lib/icp/icp.cpp:16-27``).

TPU-native formulation:

* ``precompute``/``init`` build the ``2^D`` half-cell-shifted overlapping
  maps of the original formulation (one stable sort + segment-sums each,
  all static shapes; ``overlap=0`` collapses to a single grid).
* Each iteration takes one Gauss-Newton step on the SE(D) twist.  The
  exact gradient of the NDT score is ``sum_i w_i J_i^T Sigma^{-1} r_i``
  with ``w_i = exp(-0.5 r_i^T Sigma^{-1} r_i)`` — i.e. Gauss-Newton on the
  Mahalanobis residuals with the Gaussian score as an IRLS weight (the
  positive-definite part of Magnusson's Newton Hessian, eq. 6.12-6.13).
  The solve is a batched ``(dof x dof)`` system from einsum contractions
  on the MXU; retraction is the exact SE(D) exponential
  (:mod:`icp_tpu.lie`).
* Per-lane safeguarded step selection among {full, half, zero} scored by
  the true NDT objective, as in :mod:`icp_tpu.methods.gicp`.

Cost semantics: per-point cost is the score DEFICIT averaged over grids —
``mean_g (1 - exp(-0.5 mahal))`` in [0, 1], with points that fall in no
occupied cell scoring the full deficit 1.  The driver-visible cost is the
usual ``sqrt(mean)`` over valid points, monotone-decreasing as alignment
improves.  ``get_matches`` returns None (voxel correspondences have no
target point index), as with the 3D parity family.

Config: ``cell_size`` (float, default 1.0), ``cells`` (static map slot
capacity, default 256), ``overlap`` (bool, default 1 — the 2^D shifted
grids), ``min_points`` (default 4), ``min_eigenvalue_ratio`` (default
1e-2), ``line_search`` (default 1), ``lookup`` (``"dense"`` default — the
exact-key one-hot matmul selection that rides the MXU; ``"sorted"`` — the
O(log V) searchsorted+gather path, faster on CPU backends where gathers
are cheap and V is large), ``variant`` (``"p2d"`` default;
``"d2d"`` = distribution-to-distribution, Stoyanov et al. 2012: the
SOURCE is also voxelized and its Gaussians register against the target's
under the Gaussian-product covariance ``R Σ_s Rᵀ + Σ_t`` — V cells
instead of N points per iteration, the natural form for map-to-map and
submap alignment), ``dim``.

Map-capacity overflow is recorded on the state (``state.maps.overflowed``,
one bool per grid x batch lane); deployments assert it off once per shape,
as with :mod:`icp_tpu.ops.grid_nn`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .. import geometry, lie
from ..cloud import PointCloud
from ..config import Config
from ..geometry import HIGHEST, RigidTransform
from ..ops.ndt import (
    NdtMap,
    build_ndt_map,
    build_overlapping_ndt_maps,
    inverse_small_spd,
    lookup_cells,
    lookup_cells_dense,
)
from .base import Method
from .gicp import _jacobian_rows

Array = jax.Array

DEFAULT_CELL_SIZE = 1.0
DEFAULT_CELLS = 256
DEFAULT_MIN_POINTS = 4
DEFAULT_MIN_EIG_RATIO = 1e-2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NdtState:
    transform: RigidTransform
    source: PointCloud
    target: PointCloud
    maps: NdtMap  # batch dims, then the G (grid) axis, then V slots
    match_cost: Array  # (..., N) mean-over-grids score deficit in [0, 1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NdtD2dState:
    """State of the distribution-to-distribution variant: the moving set
    is the SOURCE map's Gaussians, not the raw points."""

    transform: RigidTransform
    source: PointCloud
    target: PointCloud
    maps: NdtMap  # target maps: batch dims, then G axis, then V slots
    src_map: NdtMap  # source map, grid 0 only: batch dims, then V slots
    match_cost: Array  # (..., V) mean-over-grids deficit per source cell


def _lookup_one_grid(query: Array, grid: NdtMap, include_covs: bool = False):
    """Batched lookup: ``query (..., N, D)`` against a map whose arrays
    carry the same leading batch dims (none on the G axis)."""
    batch = query.shape[:-2]
    fn = lambda q, g: lookup_cells(q, g, include_covs=include_covs)  # noqa: E731
    if not batch:
        return fn(query, grid)
    flat_q = query.reshape((-1,) + query.shape[-2:])
    flat_m = jax.tree.map(
        lambda x: x.reshape((-1,) + x.shape[len(batch):]), grid
    )
    out = jax.vmap(fn)(flat_q, flat_m)
    return jax.tree.map(lambda x: x.reshape(batch + x.shape[1:]), out)


def create(config: Config) -> Method:
    cell_size = float(config.get("cell_size", DEFAULT_CELL_SIZE))
    cells = int(config.get("cells", DEFAULT_CELLS))
    overlap = bool(config.get("overlap", 1))
    min_points = int(config.get("min_points", DEFAULT_MIN_POINTS))
    min_ratio = float(config.get("min_eigenvalue_ratio", DEFAULT_MIN_EIG_RATIO))
    line_search = bool(config.get("line_search", 1))
    lookup = str(config.get("lookup", "dense"))
    if lookup not in ("dense", "sorted"):
        raise ValueError(f"ndt lookup must be 'dense' or 'sorted', got {lookup!r}")
    variant = str(config.get("variant", "p2d"))
    if variant not in ("p2d", "d2d"):
        raise ValueError(f"ndt variant must be 'p2d' or 'd2d', got {variant!r}")
    dim = int(config.get("dim", 2))

    def precompute(cloud: PointCloud) -> NdtMap:
        """The voxel-Gaussian map(s) of a (batched) cloud — only the
        target's are consumed.  The grid axis G sits AFTER any batch dims
        (so state pytrees stay batched-leading for the driver's per-lane
        freezing); the op itself stacks G in front."""
        nb = len(cloud.batch_shape)
        if overlap:
            maps = build_overlapping_ndt_maps(
                cloud.points,
                cloud.mask,
                cell_size,
                cells,
                min_points=min_points,
                min_eigenvalue_ratio=min_ratio,
            )
        else:
            single = build_ndt_map(
                cloud.points,
                cloud.mask,
                cell_size,
                cells,
                min_points=min_points,
                min_eigenvalue_ratio=min_ratio,
            )
            maps = jax.tree.map(lambda x: x[None], single)
        if nb:
            maps = jax.tree.map(lambda x: jnp.moveaxis(x, 0, nb), maps)
        return maps

    def _lookup_grids(a_cur: Array, maps: NdtMap, n_grids: int):
        """All grids at once: the query broadcasts over the G axis so the
        selection is ONE batched contraction instead of a per-grid Python
        loop (4 small programs -> one big MXU-friendly one).  Returns
        ``(resid, inv_cov, hit-as-dtype)`` shaped ``(..., G, N, ...)``."""
        q = jnp.broadcast_to(
            a_cur[..., None, :, :],
            a_cur.shape[:-2] + (n_grids,) + a_cur.shape[-2:],
        )
        if lookup == "dense":
            means, inv_covs, hit, _ = lookup_cells_dense(q, maps)
        else:
            means, inv_covs, hit, _ = _lookup_one_grid(q, maps)
        return q - means, inv_covs, hit.astype(a_cur.dtype)

    def _deficit(a_cur: Array, maps: NdtMap, n_grids: int):
        """Per-point mean-over-grids score deficit ``(..., N)`` in [0, 1]."""
        resid, icov, hit = _lookup_grids(a_cur, maps, n_grids)
        mahal = jnp.einsum(
            "...ni,...nij,...nj->...n", resid, icov, resid, precision=HIGHEST
        )
        deficit = jnp.where(hit > 0, 1.0 - jnp.exp(-0.5 * mahal), 1.0)
        return jnp.mean(deficit, axis=-2)

    def _init_with(source, target, guess, maps) -> NdtState:
        n_grids = maps.keys.shape[len(source.batch_shape)]
        a_cur = geometry.apply(guess, source.points)
        deficit = _deficit(a_cur, maps, n_grids)
        cost = jnp.where(source.mask, deficit, jnp.inf)
        return NdtState(guess, source, target, maps, cost)

    def init(source: PointCloud, target: PointCloud, guess: RigidTransform) -> NdtState:
        return _init_with(source, target, guess, precompute(target))

    def iterate(state: NdtState) -> NdtState:
        src = state.source
        maps = state.maps
        n_grids = maps.keys.shape[len(src.batch_shape)]
        a_cur = geometry.apply(state.transform, src.points)
        valid = src.mask.astype(src.dtype)
        jac = _jacobian_rows(a_cur, src.dim)  # (..., N, D, dof)
        dof = jac.shape[-1]

        # All 2^D grids in one batched contraction (G folded next to N).
        resid, icov, hit = _lookup_grids(a_cur, maps, n_grids)
        mahal = jnp.einsum(
            "...ni,...nij,...nj->...n", resid, icov, resid, precision=HIGHEST
        )
        # Gaussian-score IRLS weight: exactly the NDT score gradient.
        w = valid[..., None, :] * hit * jnp.exp(-0.5 * mahal)  # (..., G, N)
        wj = jnp.einsum("...gnij,...njk->...gnik", icov, jac, precision=HIGHEST)
        jtj = jnp.einsum(
            "...nik,...gnil,...gn->...kl", jac, wj, w, precision=HIGHEST
        )
        jtr = jnp.einsum(
            "...nik,...gnij,...gnj,...gn->...k", jac, icov, resid, w, precision=HIGHEST
        )

        eye = jnp.eye(dof, dtype=a_cur.dtype)
        damped = (
            jtj
            + 1e-9 * jnp.trace(jtj, axis1=-2, axis2=-1)[..., None, None] * eye
            + 1e-20 * eye
        )
        xi = -jnp.linalg.solve(damped, jtr[..., None])[..., 0]

        n_valid = jnp.maximum(jnp.sum(valid, axis=-1), 1.0)

        def post_cost(transform):
            a_new = geometry.apply(transform, src.points)
            deficit = _deficit(a_new, maps, n_grids) * valid
            return deficit, jnp.sum(deficit, axis=-1) / n_valid

        t_full = geometry.compose(lie.exp(xi, src.dim), state.transform)
        if line_search:
            t_half = geometry.compose(lie.exp(0.5 * xi, src.dim), state.transform)
            cands = [t_full, t_half, state.transform]
            scored = [post_cost(t) for t in cands]
            means_ = jnp.stack([m for _, m in scored], axis=-1)
            best = jnp.argmin(means_, axis=-1)

            def sel(values):
                stacked = jnp.stack(values, axis=-1)
                b = best.reshape(
                    best.shape + (1,) * (stacked.ndim - best.ndim - 1) + (1,)
                )
                return jnp.take_along_axis(stacked, b, axis=-1)[..., 0]

            new_transform = geometry.RigidTransform(
                sel([t.rotation for t in cands]),
                sel([t.translation for t in cands]),
            )
            deficit = sel([m for m, _ in scored])
        else:
            new_transform = t_full
            deficit, _ = post_cost(new_transform)
        cost = jnp.where(src.mask, deficit, jnp.inf)
        return dataclasses.replace(state, transform=new_transform, match_cost=cost)

    def cost(state: NdtState) -> Array:
        finite = jnp.where(state.source.mask, state.match_cost, 0.0)
        n = jnp.maximum(state.source.count.astype(finite.dtype), 1.0)
        return jnp.sqrt(jnp.sum(finite, axis=-1) / n)

    def with_precomputed(maps_a, maps_b) -> Method:
        # Only the target's maps participate in the objective.
        return Method(
            name="ndt",
            dim=dim,
            init=lambda s, t, g: _init_with(s, t, g, maps_b),
            iterate=iterate,
            cost=cost,
            precompute=precompute,
        )

    # ---- D2D variant (Stoyanov et al. 2012): Gaussians vs Gaussians ----

    def _src_grid0(maps_src: NdtMap, nb: int) -> NdtMap:
        """Grid 0 of the (possibly overlapping) source maps — D2D moves
        ONE Gaussian set; the target side keeps the 2^D smoothing."""
        return jax.tree.map(
            lambda x: jax.lax.index_in_dim(x, 0, axis=nb, keepdims=False),
            maps_src,
        )

    def _d2d_stats(transform, src_map: NdtMap, maps: NdtMap, n_grids: int):
        """(transformed means, resid, combined inverse covariance, hit)
        with a (..., G, V, ...) layout.

        The combined covariance is ``R Σ_s Rᵀ + Σ_t`` — the Gaussian-
        product form; its inverse is recomputed from the CURRENT rotation
        every evaluation (the covariance derivative is dropped from the
        GN step itself, the standard D2D approximation)."""
        mu = src_map.means  # (..., V, D)
        a_cur = geometry.apply(transform, mu)
        r = transform.rotation
        rot_cov = jnp.einsum(
            "...ab,...vbc,...dc->...vad", r, src_map.covs, r, precision=HIGHEST
        )
        q = jnp.broadcast_to(
            a_cur[..., None, :, :],
            a_cur.shape[:-2] + (n_grids,) + a_cur.shape[-2:],
        )
        if lookup == "dense":
            means_t, _, hit, _, covs_t = lookup_cells_dense(
                q, maps, include_covs=True
            )
        else:
            means_t, _, hit, _, covs_t = _lookup_one_grid(
                q, maps, include_covs=True
            )
        combined = rot_cov[..., None, :, :, :] + covs_t
        # Misses carry covs_t = 0; rot_cov alone is SPD (regularized), so
        # the inverse stays finite and the hit mask zeroes the term.
        # Closed-form adjugate inverse: jnp.linalg.inv lowers to batched
        # LU on TPU and measured 184 ms/iter at the 64k bench shape.
        icov = inverse_small_spd(combined)
        return a_cur, q - means_t, icov, hit.astype(mu.dtype)

    def _d2d_deficit(transform, src_map: NdtMap, maps: NdtMap, n_grids: int):
        """Per-source-cell mean-over-grids score deficit ``(..., V)``."""
        _, resid, icov, hit = _d2d_stats(transform, src_map, maps, n_grids)
        mahal = jnp.einsum(
            "...ni,...nij,...nj->...n", resid, icov, resid, precision=HIGHEST
        )
        deficit = jnp.where(hit > 0, 1.0 - jnp.exp(-0.5 * mahal), 1.0)
        return jnp.mean(deficit, axis=-2)

    def _init_d2d_with(source, target, guess, maps_t, src_map) -> NdtD2dState:
        n_grids = maps_t.keys.shape[len(source.batch_shape)]
        deficit = _d2d_deficit(guess, src_map, maps_t, n_grids)
        mc = jnp.where(src_map.valid, deficit, jnp.inf)
        return NdtD2dState(guess, source, target, maps_t, src_map, mc)

    def init_d2d(source, target, guess) -> NdtD2dState:
        nb = len(source.batch_shape)
        return _init_d2d_with(
            source, target, guess, precompute(target),
            _src_grid0(precompute(source), nb),
        )

    def iterate_d2d(state: NdtD2dState) -> NdtD2dState:
        src_map = state.src_map
        maps = state.maps
        nb = len(state.source.batch_shape)
        n_grids = maps.keys.shape[nb]
        svalid = src_map.valid.astype(src_map.means.dtype)

        a_cur, resid, icov, hit = _d2d_stats(
            state.transform, src_map, maps, n_grids
        )
        jac = _jacobian_rows(a_cur, dim)  # (..., V, D, dof)
        dof = jac.shape[-1]
        mahal = jnp.einsum(
            "...ni,...nij,...nj->...n", resid, icov, resid, precision=HIGHEST
        )
        w = svalid[..., None, :] * hit * jnp.exp(-0.5 * mahal)  # (..., G, V)
        wj = jnp.einsum("...gnij,...njk->...gnik", icov, jac, precision=HIGHEST)
        jtj = jnp.einsum(
            "...nik,...gnil,...gn->...kl", jac, wj, w, precision=HIGHEST
        )
        jtr = jnp.einsum(
            "...nik,...gnij,...gnj,...gn->...k",
            jac, icov, resid, w, precision=HIGHEST,
        )
        eye = jnp.eye(dof, dtype=a_cur.dtype)
        damped = (
            jtj
            + 1e-9 * jnp.trace(jtj, axis1=-2, axis2=-1)[..., None, None] * eye
            + 1e-20 * eye
        )
        xi = -jnp.linalg.solve(damped, jtr[..., None])[..., 0]

        n_valid = jnp.maximum(jnp.sum(svalid, axis=-1), 1.0)

        def post_cost(transform):
            deficit = (
                _d2d_deficit(transform, src_map, maps, n_grids) * svalid
            )
            return deficit, jnp.sum(deficit, axis=-1) / n_valid

        t_full = geometry.compose(lie.exp(xi, dim), state.transform)
        if line_search:
            t_half = geometry.compose(lie.exp(0.5 * xi, dim), state.transform)
            cands = [t_full, t_half, state.transform]
            scored = [post_cost(t) for t in cands]
            means_ = jnp.stack([m for _, m in scored], axis=-1)
            best = jnp.argmin(means_, axis=-1)

            def sel(values):
                stacked = jnp.stack(values, axis=-1)
                b = best.reshape(
                    best.shape + (1,) * (stacked.ndim - best.ndim - 1) + (1,)
                )
                return jnp.take_along_axis(stacked, b, axis=-1)[..., 0]

            new_transform = geometry.RigidTransform(
                sel([t.rotation for t in cands]),
                sel([t.translation for t in cands]),
            )
            deficit = sel([m for m, _ in scored])
        else:
            new_transform = t_full
            deficit, _ = post_cost(new_transform)
        mc = jnp.where(src_map.valid, deficit, jnp.inf)
        return dataclasses.replace(
            state, transform=new_transform, match_cost=mc
        )

    def cost_d2d(state: NdtD2dState) -> Array:
        valid = state.src_map.valid
        finite = jnp.where(valid, state.match_cost, 0.0)
        n = jnp.maximum(
            jnp.sum(valid, axis=-1).astype(finite.dtype), 1.0
        )
        return jnp.sqrt(jnp.sum(finite, axis=-1) / n)

    def with_precomputed_d2d(maps_a, maps_b) -> Method:
        # D2D consumes BOTH sides' maps (source grid 0 + target grids).
        if maps_a is None:
            raise ValueError("ndt d2d needs the source's precomputed maps")

        def init_pre(s, t, g):
            nb = len(s.batch_shape)
            return _init_d2d_with(s, t, g, maps_b, _src_grid0(maps_a, nb))

        return Method(
            name="ndt",
            dim=dim,
            init=init_pre,
            iterate=iterate_d2d,
            cost=cost_d2d,
            precompute=precompute,
        )

    if variant == "d2d":
        return Method(
            name="ndt",
            dim=dim,
            init=init_d2d,
            iterate=iterate_d2d,
            cost=cost_d2d,
            precompute=precompute,
            with_precomputed=with_precomputed_d2d,
        )

    return Method(
        name="ndt",
        dim=dim,
        init=init,
        iterate=iterate,
        cost=cost,
        precompute=precompute,
        with_precomputed=with_precomputed,
        # P2D's objective voxelizes only the TARGET; aux-caching pipelines
        # must not build Gaussian maps of every scan (ADVICE round-3).
        precompute_source=False,
    )
