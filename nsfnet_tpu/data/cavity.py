"""Lid-driven cavity dataset generation and DNS evaluation data.

Capability parity with the reference DataLoader (ev-NSFnet/cavity_data.py):

  * Boundary set: 513 points per edge (2052 total); lid profile
    u = 1 - cosh(r(x-0.5))/cosh(r/2) with r=10 (regularized corners);
    no-slip elsewhere (cavity_data.py:47-94).
  * Interior set: Latin-Hypercube N_f points, optionally sorted by
    distance-to-boundary (cavity_data.py:96-116).
  * SDF weights: w = min_w + (1-min_w)*exp(-decay*d), mean-normalized
    (cavity_data.py:118-130). Distance is computed in closed form for the
    square domain instead of a KD-tree query against the discrete boundary
    points — identical up to half the boundary spacing (~1e-3).
  * Coordinate transform [0,1] -> [-1,1] with chain-rule scale 2
    (cavity_data.py:135-142).
  * DNS eval fields from .mat (X/Y/U/V/P_ref) (cavity_data.py:144-160).

All outputs are float32 numpy arrays shaped [N, 1] per channel, ready for
padding + device_put by the solver.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from nsfnet_tpu.data.sampling import (
    boundary_distance_box,
    latin_hypercube,
    sort_by_boundary_distance,
)

LID_REG_CONST = 10.0   # cosh regularization constant r (cavity_data.py:52)
POINTS_PER_EDGE = 513  # Nx = Ny = 513 (cavity_data.py:49-50)


def lid_velocity(x: np.ndarray, r: float = LID_REG_CONST) -> np.ndarray:
    """Regularized lid profile: 1 - cosh(r(x-1/2))/cosh(r/2)
    (cavity_data.py:55). Zero at the corners; ~1 mid-lid."""
    return 1.0 - np.cosh(r * (x - 0.5)) / np.cosh(r * 0.5)


@dataclasses.dataclass
class CavityData:
    """Dataset factory for the unit-square cavity.

    Drop-in capability match for the reference DataLoader's constructor
    knobs (cavity_data.py:26).
    """

    N_f: int = 20000
    N_b: int = 1000  # kept for API parity; boundary count is set by POINTS_PER_EDGE
    sort_training_points: bool = True
    sdf_enabled: bool = False
    sdf_min_weight: float = 0.2
    sdf_decay: float = 5.0
    coord_transform: bool = False
    seed: Optional[int] = None
    use_native: bool = True  # use native/libpointgen.so when built

    def __post_init__(self):
        # Domain bounds in the TRAINING frame, fixed at construction (the
        # generation frame is always the unit square; boundary_data/
        # training_data are idempotent — repeated calls return equal data).
        lo, hi = (-1.0, 1.0) if self.coord_transform else (0.0, 1.0)
        self.x_min, self.x_max = lo, hi
        self.y_min, self.y_max = lo, hi
        self._rng = np.random.default_rng(self.seed)
        self._native_seed = (self.seed if self.seed is not None
                             else int(self._rng.integers(2**63)))
        self._draws = 0  # native-path draw counter: repeated training_data()
        # calls must yield FRESH samples (per-stage resampling), while the
        # first draw stays reproducible from `seed`
        self.pts_bc: Optional[np.ndarray] = None
        self.sdf_weights: Optional[np.ndarray] = None
        self._pre_draw_rng_state = self._rng.bit_generator.state
        self._state_is_pre_draw = True  # no draw has consumed the state yet
        self._last_rar: Optional[dict] = None    # spec of the most recent
        # draw IF it was residual-aware (rar_training_data) — rides in
        # get_state() so a resume reconstructs the mixed set without
        # re-scoring (scores depend on params the restorer no longer has)
        self._rar_replay: Optional[dict] = None  # pending spec installed by
        # set_state(): the next training_data() call replays it

    # ------------------------------------------------ sampler checkpointing
    # (SURVEY §5.4 full-state resume: a watchdog restart during a
    # resample-each-stage campaign must replay the IDENTICAL point sequence)

    def get_state(self) -> dict:
        """Sampler state as of the most recent draw: after `set_state(s)`,
        the next `training_data()` call reproduces the most recent draw
        bit-exactly and the stream continues identically thereafter.
        Records which sampling path (native/numpy) produced the stream —
        replaying on a host where the other path would be taken must fail
        loudly, not silently draw different points."""
        if self._state_is_pre_draw:
            # between set_state() and the next draw: counter/rng already
            # point AT the next draw, not past it
            draws_next, rng_state = self._draws, self._rng.bit_generator.state
            rar = self._rar_replay
        else:
            draws_next = max(self._draws - 1, 0)
            rng_state = self._pre_draw_rng_state
            rar = self._last_rar
        from nsfnet_tpu.data import native

        s = {
            "draws_next": draws_next,
            "native_seed": int(self._native_seed),
            "rng_state": rng_state,
            "native": bool(self.use_native and native.available()),
        }
        if rar is not None:
            import base64

            s["rar"] = {
                "pool_mult": int(rar["pool_mult"]),
                "top_frac": float(rar["top_frac"]),
                # uint32 little-endian, base64 — JSON-safe at N_f=120k scale
                "keep_idx": base64.b64encode(
                    np.asarray(rar["keep_idx"], dtype="<u4").tobytes()
                ).decode("ascii"),
            }
        return s

    def set_state(self, s: dict) -> None:
        from nsfnet_tpu.data import native

        if "native" in s:
            here = bool(self.use_native and native.available())
            if here != bool(s["native"]):
                if not s["native"]:
                    # Writer drew on the numpy path (e.g. libpointgen.so was
                    # not built when the campaign started — gitignored .so
                    # files do not survive a reboot). Numpy is always
                    # available, so honor the writer's path instead of
                    # refusing: an unattended watchdog resume must not
                    # crash-loop because the host later (re)built native/.
                    import logging

                    logging.getLogger("nsfnet").warning(
                        "sampler state was recorded on the numpy sampling "
                        "path; forcing use_native=False for this dataset so "
                        "the replayed points match the checkpointed vis_t "
                        "carry (native/libpointgen.so is built but will not "
                        "be used for this stream).")
                    self.use_native = False
                else:
                    raise RuntimeError(
                        "sampler state was recorded on the native sampling "
                        "path but native/libpointgen.so is unavailable on "
                        "this host — the numpy path would draw different "
                        "points than the checkpointed vis_t carry. Build "
                        "native/ (make -C native) before resuming.")
        self._draws = int(s["draws_next"])
        self._native_seed = int(s["native_seed"])
        if s.get("rng_state") is not None:
            st = dict(s["rng_state"])
            # JSON roundtrips tuples to lists; numpy accepts the dict form
            if isinstance(st.get("state"), dict):
                st["state"] = {k: int(v) if isinstance(v, (int, float)) else v
                               for k, v in st["state"].items()}
            self._rng.bit_generator.state = st
            self._pre_draw_rng_state = st
        self._state_is_pre_draw = True
        r = s.get("rar")
        if r is not None:
            idx = r["keep_idx"]
            if isinstance(idx, str):
                import base64

                idx = np.frombuffer(base64.b64decode(idx), dtype="<u4")
            self._rar_replay = {
                "pool_mult": int(r["pool_mult"]),
                "top_frac": float(r["top_frac"]),
                "keep_idx": np.asarray(idx, dtype=np.int64),
            }
        else:
            self._rar_replay = None
        self._last_rar = None

    @property
    def coord_scale(self) -> float:
        """Chain-rule factor for the [0,1] -> [-1,1] transform
        (cavity_data.py:45)."""
        return 2.0 if self.coord_transform else 1.0

    def _to_centered(self, a: np.ndarray) -> np.ndarray:
        return a * 2.0 - 1.0

    def boundary_data(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """(x_b, y_b, u_b, v_b), each [4*513, 1] float32; order: bottom,
        top(lid), left, right (cavity_data.py:56-72)."""
        n = POINTS_PER_EDGE
        line = np.linspace(0.0, 1.0, n)  # generation frame: unit square
        x_b = np.concatenate([line, line, np.zeros(n), np.ones(n)])
        y_b = np.concatenate([np.zeros(n), np.ones(n), line, line])
        u_b = np.concatenate([np.zeros(n), lid_velocity(line), np.zeros(n), np.zeros(n)])
        v_b = np.zeros_like(x_b)

        pts = np.stack([x_b, y_b], axis=1)
        if self.coord_transform:
            pts = self._to_centered(pts)
            x_b, y_b = pts[:, 0], pts[:, 1]
        self.pts_bc = pts
        col = lambda a: a.reshape(-1, 1).astype(np.float32)
        return col(x_b), col(y_b), col(u_b), col(v_b)

    def training_data(self) -> Tuple[np.ndarray, np.ndarray]:
        """(x_f, y_f) interior Latin-Hypercube collocation points
        (cavity_data.py:96-116). Requires boundary_data() first (to fix the
        coordinate frame), like the reference."""
        if self.pts_bc is None:
            raise RuntimeError("load boundary data first (fixes the coordinate frame)")
        self._pre_draw_rng_state = self._rng.bit_generator.state
        self._state_is_pre_draw = False
        if self._rar_replay is not None:
            # restored mid-campaign: reconstruct the residual-aware mixed
            # set from the stored selection — raw-draw order (pool, fill)
            # matches rar_training_data exactly, so the RNG/native streams
            # stay aligned with the writer's
            spec, self._rar_replay = self._rar_replay, None
            keep_idx = np.asarray(spec["keep_idx"], dtype=np.int64)
            pool = self._raw_draw(int(spec["pool_mult"]) * self.N_f)
            fill = self._raw_draw(self.N_f - keep_idx.shape[0], salt=3571)
            xye = np.concatenate([pool[keep_idx], fill], axis=0)
            self._last_rar = spec
        else:
            xye = self._raw_draw(self.N_f)
            self._last_rar = None
        self._draws += 1
        return self._finalize(xye)

    def rar_training_data(self, score_fn, pool_mult: int = 4,
                          top_frac: float = 0.5) -> Tuple[np.ndarray, np.ndarray]:
        """Residual-aware resample (RAR): draw a pool_mult x N_f candidate
        pool, keep the top_frac x N_f points with the largest
        `score_fn(x, y)` (PDE residual magnitude — solver.residuals_at),
        fill the remainder with a fresh uniform LH draw. Concentrates
        collocation where the PDE is violated instead of re-descending the
        same uniform-draw loss floor. No reference counterpart: ev-NSFnet
        trains one fixed LHS draw for the entire curriculum
        (ev-NSFnet/pinn_solver.py:160-184).

        Consumes ONE logical draw: the kept-point indices ride in
        get_state(), so a watchdog resume replays the identical mixed set
        via a plain training_data() call — without needing the scores (they
        depend on the writer's mid-campaign params)."""
        if self.pts_bc is None:
            raise RuntimeError("load boundary data first (fixes the coordinate frame)")
        pool_mult = int(pool_mult)
        if pool_mult < 1:
            raise ValueError(f"rar pool_mult must be >= 1, got {pool_mult}")
        if not 0.0 < float(top_frac) <= 1.0:
            raise ValueError(f"rar top_frac must be in (0, 1], got {top_frac}")
        # Bookkeeping commits are DEFERRED until after score_fn: the scoring
        # is a seconds-long device dispatch, and a GracefulStop (SIGTERM)
        # landing inside it must leave get_state() describing the PREVIOUS
        # completed draw — mutating first would pair the old draw's spec
        # with this aborted draw's RNG rewind point (silent point mismatch
        # on a NumPy-path resume).
        pre_state = self._rng.bit_generator.state
        pool = self._raw_draw(pool_mult * self.N_f)
        pts = self._to_centered(pool) if self.coord_transform else pool
        scores = np.asarray(score_fn(
            pts[:, 0:1].astype(np.float32), pts[:, 1:2].astype(np.float32)
        )).reshape(-1)
        if scores.shape[0] != pool.shape[0]:
            raise ValueError(
                f"score_fn returned {scores.shape[0]} scores for "
                f"{pool.shape[0]} pool points")
        keep_n = min(self.N_f, max(1, int(round(float(top_frac) * self.N_f))))
        keep_idx = np.sort(
            np.argpartition(-scores, keep_n - 1)[:keep_n]).astype(np.int64)
        fill = self._raw_draw(self.N_f - keep_n, salt=3571)
        xye = np.concatenate([pool[keep_idx], fill], axis=0)
        self._pre_draw_rng_state = pre_state
        self._state_is_pre_draw = False
        self._last_rar = {"pool_mult": pool_mult, "top_frac": float(top_frac),
                          "keep_idx": keep_idx}
        self._rar_replay = None
        self._draws += 1
        return self._finalize(xye)

    def _raw_draw(self, n: int, salt: int = 0) -> np.ndarray:
        """One raw Latin-Hypercube draw of n points in the GENERATION frame
        (unit square). Does NOT touch the draw-counter bookkeeping — callers
        own the logical-draw accounting. `salt` separates multiple raw draws
        within one logical draw on the native path; salt < 7919 guarantees
        no collision with any later draw's base seed."""
        if n <= 0:
            return np.zeros((0, 2), dtype=np.float64)
        from nsfnet_tpu.data import native

        bounds = [[0.0, 1.0], [0.0, 1.0]]
        if self.use_native and native.available():
            return native.lh_sample(n, bounds,
                                    self._native_seed + 7919 * self._draws + salt)
        return latin_hypercube(n, bounds, rng=self._rng)

    def _finalize(self, xye: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Generation-frame points -> training-frame columns: coordinate
        transform, optional boundary-distance sort, SDF weights."""
        from nsfnet_tpu.data import native

        go_native = self.use_native and native.available()
        if self.coord_transform:
            xye = self._to_centered(xye)
        if self.sort_training_points:
            srt = native.sort_by_distance(xye, self.pts_bc) if go_native else None
            xye = srt if srt is not None else sort_by_boundary_distance(xye, self.pts_bc)
        if self.sdf_enabled:
            w = (native.sdf_weights(xye, self.x_min, self.x_max,
                                    float(np.clip(self.sdf_min_weight, 1e-6, 1.0)),
                                    max(0.0, float(self.sdf_decay)))
                 if go_native else None)
            self.sdf_weights = w if w is not None else self._compute_sdf_weights(xye)
        else:
            self.sdf_weights = None
        col = lambda a: a.reshape(-1, 1).astype(np.float32)
        return col(xye[:, 0]), col(xye[:, 1])

    def _compute_sdf_weights(self, pts: np.ndarray) -> np.ndarray:
        """w = min_w + (1-min_w)*exp(-decay*d), mean-normalized
        (cavity_data.py:118-130)."""
        d = boundary_distance_box(pts, lo=self.x_min, hi=self.x_max)
        min_w = float(np.clip(self.sdf_min_weight, 1e-6, 1.0))
        decay = max(0.0, float(self.sdf_decay))
        w = min_w + (1.0 - min_w) * np.exp(-decay * d)
        mean_w = w.mean()
        if mean_w > 0:
            w = w / mean_w
        return w.astype(np.float32)

    def evaluate_data(self, filename: str):
        """Load DNS reference fields X/Y/U/V/P_ref from a .mat file
        (cavity_data.py:144-160). Returns 5 columns [M, 1] float32 (P may
        contain NaN, masked downstream)."""
        import scipy.io

        data = scipy.io.loadmat(filename)
        x, y = data["X_ref"], data["Y_ref"]
        u, v, p = data["U_ref"], data["V_ref"], data["P_ref"]
        if self.coord_transform:
            x, y = self._to_centered(x), self._to_centered(y)
        col = lambda a: np.asarray(a).reshape(-1, 1).astype(np.float32)
        return col(x), col(y), col(u), col(v), col(p)
