"""NumPy fp64 oracle: an independent, line-faithful transcription of the
reference C++ semantics (cornellev/icp) used as the golden model in tests.

The C++ reference cannot be compiled in this environment (no Eigen), so
parity targets come from this oracle, which mirrors the reference's math
op-for-op — including its quirks:

* k-d tree "min_dist" is Euclidean, not squared (``include/algo/kdtree.h:121-127``)
* vanilla 2D matches query the *untransformed* source (``vanilla.cpp:80``)
* per-method cost semantics (sqrt(dist) / dist^2 / normalized blend)
* 3D methods advance a working copy ``c`` and leave base matches empty
  (driver cost 0) (``vanilla_3d.cpp:90-106``)
* driver tolerance cascade order (``driver.h:154-222``)

Everything here is plain NumPy float64 — no JAX — so any agreement with the
icp_tpu implementation is evidence, not tautology.
"""

from __future__ import annotations

import numpy as np


def brute_nn(queries: np.ndarray, targets: np.ndarray):
    """Exact 1-NN, first index wins ties. Returns (euclid_dists, indices).

    Empty targets return zero matches (the reference's compute_matches
    guards empties, ``vanilla.cpp:69-71``, leaving value-initialized
    matches with cost 0).
    """
    if len(targets) == 0:
        return np.zeros(len(queries)), np.zeros(len(queries), dtype=np.int64)
    d2 = ((queries[:, None, :] - targets[None, :, :]) ** 2).sum(-1)
    idx = np.argmin(d2, axis=1)
    return np.sqrt(d2[np.arange(len(queries)), idx]), idx


class OracleICP:
    dim = 2  # overridden by subclasses

    def __init__(self):
        self.transform = np.eye(self.dim + 1)

    # transform is a (D+1, D+1) homogeneous matrix
    @staticmethod
    def _hom(dim):
        return np.eye(dim + 1)

    @staticmethod
    def _apply(T, pts):
        return pts @ T[:-1, :-1].T + T[:-1, -1]

    @staticmethod
    def _compose(step, T):
        return step @ T

    def begin(self, a, b, guess):
        self.a = np.asarray(a, dtype=np.float64)
        self.b = np.asarray(b, dtype=np.float64)
        self.transform = np.asarray(guess, dtype=np.float64).copy()
        self.match_cost = np.zeros(len(self.a))
        self.match_pair = np.zeros(len(self.a), dtype=np.int64)
        self.setup()

    def calculate_cost(self):
        # ``icp.h:149-155``
        return np.sqrt(self.match_cost.sum() / len(self.a))

    def current_transform(self):
        return self.transform


class OracleVanilla2d(OracleICP):
    dim = 2

    def setup(self):
        self._compute_matches()

    def _compute_matches(self):
        # quirk: query with the untransformed a (``vanilla.cpp:80``)
        dist, idx = brute_nn(self.a, self.b)
        self.match_pair = idx
        self.match_cost = np.sqrt(dist)  # sqrt(Euclidean) (``vanilla.cpp:84``)

    def iterate(self):
        if len(self.a) == 0 or len(self.b) == 0:
            return
        a_current = self._apply(self.transform, self.a)
        a_cm = a_current.mean(0)
        self._compute_matches()
        matched_b = self.b[self.match_pair]
        b_cm = matched_b.mean(0)
        n = (a_current - a_cm).T @ (matched_b - b_cm)
        step = self._svd_step_2d(n, a_cm, b_cm)
        self.transform = self._compose(step, self.transform)

    @staticmethod
    def _svd_step_2d(n, a_cm, b_cm):
        u, _, vt = np.linalg.svd(n)
        v = vt.T
        r = v @ u.T
        if np.linalg.det(r) < 0:
            v[:, 1] *= -1
            r = v @ u.T
        step = np.eye(3)
        step[:2, :2] = r
        step[:2, 2] = b_cm - r @ a_cm
        return step


class OracleTrimmed2d(OracleVanilla2d):
    def __init__(self, overlap_rate=0.9):
        super().__init__()
        self.overlap_rate = overlap_rate

    def setup(self):
        self.a_current = self._apply(self.transform, self.a)
        self._compute_matches()

    def _compute_matches(self):
        # brute force squared distances from a_current (``trimmed.cpp:95-109``)
        d2 = ((self.a_current[:, None, :] - self.b[None, :, :]) ** 2).sum(-1)
        self.match_pair = np.argmin(d2, axis=1)
        self.match_cost = d2[np.arange(len(self.a)), self.match_pair]

    def iterate(self):
        n_pts = len(self.a)
        self.a_current = self._apply(self.transform, self.a)
        self._compute_matches()
        order = np.argsort(self.match_cost, kind="stable")
        new_n = max(int(self.overlap_rate * n_pts), 1)
        keep = order[:new_n]
        ta = self.a_current[keep]
        tb = self.b[self.match_pair[keep]]
        a_cm, b_cm = ta.mean(0), tb.mean(0)
        n = (ta - a_cm).T @ (tb - b_cm)
        step = self._svd_step_2d(n, a_cm, b_cm)
        self.transform = self._compose(step, self.transform)


class OracleFeatureAware2d(OracleTrimmed2d):
    MIN_NORM = 1e-6

    def __init__(self, overlap_rate=0.9, feature_weight=0.7, symmetric_neighbors=10):
        OracleICP.__init__(self)
        self.overlap_rate = overlap_rate
        self.fw = feature_weight
        self.nw = 1 - feature_weight
        self.sn = symmetric_neighbors

    def setup(self):
        self.a_current = self._apply(self.transform, self.a)
        a_feat = self._features(self.a_current)
        b_feat = self._features(self.b)
        fd = np.linalg.norm(a_feat[:, None, :] - b_feat[None, :, :], axis=-1)
        mx = fd.max() if fd.size else 0.0
        if mx > self.MIN_NORM:
            fd = fd / mx
        self.feature_dists = fd
        self._compute_matches()

    def _features(self, pts):
        # ``feature_aware.cpp:151-177``
        n = len(pts)
        feats = np.zeros((n, 2 * self.sn))
        c = pts.mean(0)
        r = np.linalg.norm(pts - c, axis=1)
        for i in range(n):
            lower = max(0, i - self.sn)
            for j in range(lower, i):
                feats[i, j - lower] = r[j] - r[i]
            upper = min(n - 1, i + self.sn)
            for j in range(i + 1, upper + 1):
                feats[i, j - i - 1 + self.sn] = r[j] - r[i]
        return feats

    def _compute_matches(self):
        d = np.sqrt(((self.a_current[:, None, :] - self.b[None, :, :]) ** 2).sum(-1))
        mx = d.max() if d.size else 0.0
        if mx > self.MIN_NORM:
            d = d / mx
        cost = self.nw * d + self.fw * self.feature_dists
        self.match_pair = np.argmin(cost, axis=1)
        self.match_cost = cost[np.arange(len(self.a)), self.match_pair]


class OracleVanilla3d(OracleICP):
    dim = 3

    def setup(self):
        self.c = self.a.copy()  # quirk: ignores the guess (``vanilla_3d.cpp:71``)
        self.internal_cost = np.finfo(np.float64).max

    def calculate_cost(self):
        return 0.0  # base matches never filled (``vanilla_3d.cpp`` quirk)

    @staticmethod
    def _best_fit(A, B):
        a_cm, b_cm = A.mean(0), B.mean(0)
        n = (A - a_cm).T @ (B - b_cm)
        u, _, vt = np.linalg.svd(n)
        v = vt.T
        r = v @ u.T
        if np.linalg.det(r) < 0:
            v = v.copy()
            v[:, 2] *= -1
            r = v @ u.T
        step = np.eye(4)
        step[:3, :3] = r
        step[:3, 3] = b_cm - r @ a_cm
        return step

    def iterate(self):
        dist, idx = brute_nn(self.c, self.b)
        dist = np.sqrt(dist)  # sqrt(Euclidean) (``vanilla_3d.cpp:41``)
        matched_b = self.b[idx]
        step = self._best_fit(self.c, matched_b)
        self.c = self._apply(step, self.c)
        self.transform = self._compose(step, self.transform)
        self.internal_cost = dist.mean() if len(dist) else np.finfo(np.float64).max


class OracleTrimmed3d(OracleVanilla3d):
    def __init__(self, max_distance=1.0):
        super().__init__()
        self.max_distance = max_distance

    def iterate(self):
        dist, idx = brute_nn(self.c, self.b)
        dist = np.sqrt(dist)
        gate = dist <= self.max_distance  # gates sqrt(Euclidean)!
        step = self._best_fit(self.c[gate], self.b[idx[gate]])
        self.c = self._apply(step, self.c)
        self.transform = self._compose(step, self.transform)
        self.internal_cost = dist.mean() if len(dist) else np.finfo(np.float64).max


class OracleDriver:
    """Transcription of ``ICPDriver`` (``driver.h:51-222``)."""

    def __init__(self, icp):
        self.icp = icp
        self.min_iterations = None
        self.max_iterations = None
        self.stop_cost = None
        self.relative_cost_tolerance = None
        self.absolute_cost_tolerance = None
        self.angle_tolerance = None
        self.translation_tolerance = None

    def converge(self, a, b, guess):
        self.icp.begin(a, b, guess)
        cost = self.icp.calculate_cost()
        transform = self.icp.current_transform()
        iteration = 0
        last = None
        while not self._should_terminate(cost, iteration, transform, last):
            last = (cost, transform)
            self.icp.iterate()
            iteration += 1
            cost = self.icp.calculate_cost()
            transform = self.icp.current_transform()
        return cost, iteration, transform

    def _should_terminate(self, cost, iteration, transform, last):
        if self.min_iterations is not None and iteration < self.min_iterations:
            return False
        if self.max_iterations is not None and iteration >= self.max_iterations:
            return True
        if self.stop_cost is not None and cost < self.stop_cost:
            return True
        if last is None:
            return False
        last_cost, last_transform = last
        delta = cost - last_cost
        if self.absolute_cost_tolerance is not None and abs(delta) < self.absolute_cost_tolerance:
            return True
        with np.errstate(invalid="ignore", divide="ignore"):
            rel = abs(delta) / cost
        if self.relative_cost_tolerance is not None and rel < self.relative_cost_tolerance:
            return True
        if self.angle_tolerance is not None and self.translation_tolerance is not None:
            r_step = transform[:-1, :-1] @ last_transform[:-1, :-1].T
            if r_step.shape[0] == 2:
                angle = np.arctan2(r_step[1, 0], r_step[0, 0])
            else:
                # sin/cos form, matching geometry.rotation_angle_3d (and
                # Eigen AngleAxis's precision for tiny step angles).
                skew = 0.5 * np.array(
                    [
                        r_step[2, 1] - r_step[1, 2],
                        r_step[0, 2] - r_step[2, 0],
                        r_step[1, 0] - r_step[0, 1],
                    ]
                )
                angle = np.arctan2(np.linalg.norm(skew), (np.trace(r_step) - 1) / 2)
            tdelta = np.linalg.norm(transform[:-1, -1] - last_transform[:-1, -1])
            if abs(angle) < self.angle_tolerance and tdelta < self.translation_tolerance:
                return True
        return False
