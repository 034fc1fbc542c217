"""Convergence driver.

TPU-native re-design of ``ICPDriver<Dim>`` (``include/icp/driver.h:20-236``).
The C++ ``while (!should_terminate) iterate()`` host loop becomes a
``jax.lax.while_loop`` compiled into a single XLA program: every tolerance
predicate is computed on-device and no host round-trip happens per
iteration.

Batching is first-class: all states carry arbitrary leading batch
dimensions, and :func:`converge` runs every pair until **each** pair has
individually terminated.  Terminated lanes are frozen (their state, cost and
iteration count stop updating), so the reported per-pair iteration counts
and results are exactly what a sequential per-pair run would produce —
the loop just keeps spinning until the last lane settles.

Termination criteria and their exact evaluation order replicate
``should_terminate`` (``driver.h:154-222``):

1. ``min_iterations`` not yet reached        -> keep going (overrides all)
2. ``max_iterations`` reached                -> stop
3. ``cost < stop_cost``                      -> stop
4. (time limit — host-stepped driver only; wall-clock cannot be read
   inside a compiled loop)
5. no previous state yet                     -> keep going
6. ``|Δcost| < absolute_cost_tolerance``     -> stop
7. ``|Δcost| / cost < relative_cost_tol``    -> stop  (0/0 = NaN -> false,
   matching C++ IEEE semantics for the 3D zero-cost quirk)
8. both ``|angle(R_cur R_prevᵀ)| < angle_tolerance`` (2D smallest angle /
   3D axis-angle, ``driver.h:193-211``) and
   ``|t_cur − t_prev| < translation_tolerance`` -> stop

The check runs **before** the first iteration using the initial cost
(``driver.h:55-63``), so e.g. ``max_iterations=0`` performs no iterations.

Criterion *presence* is static (Python ``None`` checks specialize the traced
predicate); criterion *values* are baked constants.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax
import jax.numpy as jnp

from . import geometry
from .cloud import PointCloud
from .geometry import RigidTransform
from .methods.base import Method

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DriverConfig:
    """Static termination criteria — the 8 setter knobs of ``ICPDriver``
    (``driver.h:80-151``).  ``None`` means "criterion not set"."""

    min_iterations: int | None = None
    max_iterations: int | None = None
    stop_cost: float | None = None
    absolute_cost_tolerance: float | None = None
    relative_cost_tolerance: float | None = None
    angle_tolerance: float | None = None  # radians; paired with translation_tolerance
    translation_tolerance: float | None = None
    time_limit: float | None = None  # seconds; host-stepped driver only

    def __post_init__(self):
        if (self.angle_tolerance is None) != (self.translation_tolerance is None):
            raise ValueError(
                "angle_tolerance and translation_tolerance must be set together "
                "(ICPDriver::set_transform_tolerance)"
            )
        if (
            self.min_iterations is not None
            and self.max_iterations is not None
            and self.min_iterations > self.max_iterations
        ):
            raise ValueError("min_iterations > max_iterations")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ConvergenceState:
    """Result of :func:`converge` — mirrors ``ICPDriver::ConvergenceState``
    (``driver.h:24-33``), with batch dims and the final method state."""

    cost: Array  # (...,)
    iteration_count: Array  # (...,) int32
    transform: RigidTransform  # (..., D, D) / (..., D)


def _should_terminate(
    config: DriverConfig,
    cost: Array,
    iteration: Array,
    transform: RigidTransform,
    has_last: Array,
    last_cost: Array,
    last_transform: RigidTransform,
) -> Array:
    """Vectorized ``ICPDriver::should_terminate`` (``driver.h:154-222``)."""
    false = jnp.zeros(cost.shape, dtype=bool)
    terminate = false

    if config.max_iterations is not None:
        terminate = terminate | (iteration >= config.max_iterations)
    if config.stop_cost is not None:
        terminate = terminate | (cost < config.stop_cost)

    progress_term = false
    if config.absolute_cost_tolerance is not None or config.relative_cost_tolerance is not None:
        delta = jnp.abs(cost - last_cost)
        if config.absolute_cost_tolerance is not None:
            progress_term = progress_term | (delta < config.absolute_cost_tolerance)
        if config.relative_cost_tolerance is not None:
            rel = delta / cost  # 0/0 -> NaN -> comparison false, as in C++
            progress_term = progress_term | (rel < config.relative_cost_tolerance)
    if config.angle_tolerance is not None:
        rot_step = jnp.matmul(
            transform.rotation,
            jnp.swapaxes(last_transform.rotation, -1, -2),
            precision=geometry.HIGHEST,
        )
        angle = geometry.rotation_angle(rot_step)
        trans_delta = jnp.linalg.norm(
            transform.translation - last_transform.translation, axis=-1
        )
        progress_term = progress_term | (
            (jnp.abs(angle) < config.angle_tolerance)
            & (trans_delta < config.translation_tolerance)
        )

    terminate = terminate | (has_last & progress_term)

    if config.min_iterations is not None:
        terminate = terminate & (iteration >= config.min_iterations)
    return terminate


def converge(
    method: Method,
    source: PointCloud,
    target: PointCloud,
    guess: RigidTransform,
    config: DriverConfig,
) -> tuple[ConvergenceState, Any]:
    """Run ICP to convergence as one compiled ``lax.while_loop``.

    Equivalent to ``ICPDriver::converge`` (``driver.h:51-72``) but batched:
    leading batch dims of the inputs are carried through, and each lane
    terminates independently.  Returns ``(ConvergenceState, final method
    state)``.

    ``time_limit`` is not supported here (no wall clock inside a compiled
    loop) — use :func:`converge_stepped` for that.
    """
    if config.time_limit is not None:
        raise ValueError("time_limit requires the host-stepped driver (converge_stepped)")
    if not (source.dim == target.dim == guess.dim == method.dim):
        raise ValueError(
            f"dimension mismatch: source {source.dim}D, target {target.dim}D, "
            f"guess {guess.dim}D, method '{method.name}' is {method.dim}D"
        )
    if all(
        getattr(config, f.name) is None
        for f in dataclasses.fields(DriverConfig)
        if f.name != "min_iterations"
    ):
        raise ValueError("no termination criterion set; the loop would never end")

    state0 = method.init(source, target, guess)
    cost0 = method.cost(state0)
    iter0 = jnp.zeros(cost0.shape, dtype=jnp.int32)
    has_last0 = jnp.zeros(cost0.shape, dtype=bool)

    active0 = ~_should_terminate(
        config, cost0, iter0, state0.transform, has_last0, cost0, state0.transform
    )

    carry0 = (state0, cost0, iter0, active0, has_last0)

    def cond_fn(carry):
        *_, active, _ = carry
        return jnp.any(active)

    def body_fn(carry):
        state, cost, iteration, active, has_last = carry
        last_cost, last_transform = cost, state.transform

        new_state = method.iterate(state)
        new_cost = method.cost(new_state)

        # Freeze terminated lanes: keep their old state/cost/iteration.
        def sel(new, old):
            act = active.reshape(active.shape + (1,) * (new.ndim - active.ndim))
            return jnp.where(act, new, old)

        state = jax.tree.map(sel, new_state, state)
        cost = jnp.where(active, new_cost, cost)
        iteration = iteration + active.astype(jnp.int32)
        has_last = has_last | active

        still = ~_should_terminate(
            config, cost, iteration, state.transform, has_last, last_cost, last_transform
        )
        return (state, cost, iteration, active & still, has_last)

    state, cost, iteration, _, _ = jax.lax.while_loop(cond_fn, body_fn, carry0)
    return ConvergenceState(cost, iteration, state.transform), state


def make_converge_fn(method: Method, config: DriverConfig):
    """A jitted ``(source, target, guess) -> (ConvergenceState, state)``.

    Method and driver config are closed over (static); one compilation per
    (method, config, input shapes).
    """

    @jax.jit
    def fn(source: PointCloud, target: PointCloud, guess: RigidTransform):
        return converge(method, source, target, guess, config)

    return fn


def converge_stepped(
    method: Method,
    source: PointCloud,
    target: PointCloud,
    guess: RigidTransform,
    config: DriverConfig,
) -> tuple[ConvergenceState, Any]:
    """Host-stepped driver: one jitted ``iterate`` per Python-loop step.

    Supports ``time_limit`` (checked on the host between device steps, like
    the reference's ``driver.h:169-174``) and is what the interactive
    visualizer uses for pause/single-step.  Unbatched and batched states both
    work, but all lanes step together; per-lane freezing matches
    :func:`converge`.
    """
    if not (source.dim == target.dim == guess.dim == method.dim):
        raise ValueError(
            f"dimension mismatch: source {source.dim}D, target {target.dim}D, "
            f"guess {guess.dim}D, method '{method.name}' is {method.dim}D"
        )
    if all(
        getattr(config, f.name) is None
        for f in dataclasses.fields(DriverConfig)
        if f.name != "min_iterations"
    ):
        raise ValueError("no termination criterion set; the loop would never end")
    start = time.monotonic()
    state = method.init(source, target, guess)
    step_fn = jax.jit(method.iterate)
    cost_fn = jax.jit(method.cost)

    cost = cost_fn(state)
    iteration = jnp.zeros(cost.shape, dtype=jnp.int32)
    has_last = jnp.zeros(cost.shape, dtype=bool)
    active = ~_should_terminate(
        config, cost, iteration, state.transform, has_last, cost, state.transform
    )

    while bool(jnp.any(active)):
        if config.time_limit is not None and (time.monotonic() - start) > config.time_limit:
            break
        last_cost, last_transform = cost, state.transform
        new_state = step_fn(state)
        new_cost = cost_fn(new_state)

        def sel(new, old):
            act = active.reshape(active.shape + (1,) * (new.ndim - active.ndim))
            return jnp.where(act, new, old)

        state = jax.tree.map(sel, new_state, state)
        cost = jnp.where(active, new_cost, cost)
        iteration = iteration + active.astype(jnp.int32)
        has_last = has_last | active
        active = active & ~_should_terminate(
            config, cost, iteration, state.transform, has_last, last_cost, last_transform
        )

    return ConvergenceState(cost, iteration, state.transform), state
