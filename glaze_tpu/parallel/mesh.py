"""Device-mesh parallel rendering.

The reference is strictly single-GPU (SURVEY 2.8); this module is the
TPU-native scaling design it lacks: a 1D ``jax.sharding.Mesh`` over the
pixel axis. The scene pytree is replicated (Sponza-scale scenes are a few
hundred MB at most), the path-state pytree is sharded, and each chip
advances its own pixel rows — collectives only at image assembly
(an all-gather XLA inserts when the host reads the image). Scaling spp
instead of pixels is the same mesh with a "samples" axis: every chip
renders the full image with different seeds and the accumulation buffers
are psum-reduced.

Every mode runs the launch under ``shard_map``, NOT bare GSPMD
propagation: the launch body contains a GLOBAL Morton/compaction argsort
and Pallas custom-calls, and GSPMD can partition neither — it inserts
all-gathers around the sort and replicates the custom-call, which
measured 8x SLOWER at 8 devices on a fixed frame (strong-scaling probe,
tools/bench_scaling_cpu.py, 2026-08-19). Under shard_map each device
sorts and traces ITS OWN pixel shard locally — the sort is an internal
optimization whose scope is free to shrink — so the hot loop has zero
collectives by construction; per-lane results are unchanged because a
row-union visit set is always a superset of each lane's own needed
nodes (extra tests never change a lane's best hit).

ICI does the heavy lifting; no NCCL/MPI translation (SURVEY 2.8's table).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

from glaze_tpu.render import integrator as integ

AXIS = "pixels"


def make_mesh(devices=None) -> Mesh:
    """1D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def _pixel_spec(x):
    """The pixel axis is the LAST axis of every state leaf (SoA)."""
    if x.ndim == 0:
        return P()
    return P(*([None] * (x.ndim - 1)), AXIS)


def _put_once(x, sh):
    """device_put that skips already-equivalently-placed arrays.

    An unconditional device_put re-copies the whole replicated scene
    (hundreds of MB) on EVERY sharded render call — measured ~250 ms per
    call on the bench scene (tools/bench_sharded_gap.py); with the skip,
    repeat calls on persistently-placed pytrees are free."""
    cur = getattr(x, "sharding", None)
    if cur is not None and cur.is_equivalent_to(sh, x.ndim):
        return x
    return jax.device_put(x, sh)


def place_replicated(tree, mesh: Mesh):
    """Places a pytree (e.g. the DeviceScene) replicated over ``mesh``
    ONCE — pass the result into the sharded render calls so their
    internal ``_put_once`` placement is a no-op on every call."""
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: _put_once(x, repl), tree)


def shard_state(state: integ.PathState, mesh: Mesh) -> integ.PathState:
    """Places the path state sharded over the pixel axis."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, _pixel_spec(x)))

    return jax.tree.map(put, state)


def unshard_state(state: integ.PathState) -> integ.PathState:
    """Gathers the state to host (single process)."""
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), state)


@functools.lru_cache(maxsize=None)
def _pix_impl(mesh, state_specs, width, height, is_persp, direct_only,
              steps, alpha_rounds, coherent, sampler="pcg"):
    """jit(shard_map(scan-of-launch_step)) for the pixel mode, cached per
    (mesh, state spec tree, statics). Each device runs the FULL launch —
    Morton sort, Pallas trace, shade — on its own contiguous pixel slice;
    no collectives anywhere in the loop (see module docstring)."""

    def local(scene, state, seeds, offsets, cam2world, screen2cam, px, py,
              sampler_seed, lane_active):
        size = jnp.asarray([width, height], jnp.float32)

        def body(st, inp):
            seed, offset = inp
            st = integ.launch_step(
                scene, st, seed, offset, cam2world, screen2cam, px, py,
                size, is_persp=is_persp, direct_only=direct_only,
                alpha_rounds=alpha_rounds, coherent=coherent,
                sampler=sampler, sampler_seed=sampler_seed,
                lane_active=lane_active,
            )
            return st, None

        state, _ = jax.lax.scan(body, state, (seeds, offsets), length=steps)
        return state

    sharded = _shard_map(
        local, mesh=mesh,
        in_specs=(P(), state_specs, P(), P(), P(), P(), P(AXIS), P(AXIS),
                  P(), P(AXIS)),
        out_specs=state_specs,
        check_vma=False,
    )
    # donate the state: in/out specs match, so XLA aliases the buffers.
    # Through the axon TPU tunnel this is the difference between 3591 and
    # 1602 ms/launch at 1080p n=1 (non-donated sharded outputs round-trip
    # the ~200 MB state per call). Callers must rebind (st = f(..., st)).
    return jax.jit(sharded, donate_argnums=(1,))


@functools.lru_cache(maxsize=8)
def _placed_coords(mesh, width, height, spec):
    """Device-resident (px, py) per (mesh, frame, spec): pixel_coords
    builds fresh host arrays every call, and re-uploading two (P,)
    float32 arrays through the TPU tunnel per render call costs real
    wall time at 1080p."""
    px, py = integ.pixel_coords(width, height)
    sh = NamedSharding(mesh, spec)
    return jax.device_put(px, sh), jax.device_put(py, sh)


def render_steps_sharded(scene, state, seeds, offsets, cam2world, screen2cam,
                         mesh: Mesh, *, width, height, is_persp,
                         direct_only, steps, alpha_rounds=0, coherent=None,
                         sampler="pcg", sampler_seed=0, lane_active=None):
    """`steps` launches with the pixel axis sharded over ``mesh``.

    shard_map, not GSPMD propagation: each device advances its own pixel
    slice with a LOCAL trace sort and local Pallas kernels, so the scan
    body has zero collectives (GSPMD all-gathers the global argsort —
    measured 8x slower at 8 devices). Per-lane radiance is unchanged:
    the sort is unsorted after the trace and a packet-union visit set is
    a superset of every member lane's needed nodes.

    The state is DONATED: rebind it (``st = render_steps_sharded(..,
    st, ..)``) and never reuse the argument after the call.
    """
    n = mesh.devices.size
    p = integ.pixel_count(width, height)
    if p % n:
        raise ValueError(f"pixel count {p} not divisible by mesh size {n}")
    repl = NamedSharding(mesh, P())
    px, py = _placed_coords(mesh, width, height, P(AXIS))
    state = jax.tree.map(
        lambda x: _put_once(x, NamedSharding(mesh, _pixel_spec(x))), state
    )
    scene = jax.tree.map(lambda x: _put_once(x, repl), scene)
    state_specs = jax.tree.map(_pixel_spec, state)
    if lane_active is None:
        lane_active = jnp.ones((p,), bool)
    lane_active = _put_once(lane_active,
                            NamedSharding(mesh, P(AXIS)))
    impl = _pix_impl(mesh, state_specs, width, height, is_persp,
                     direct_only, steps, alpha_rounds,
                     integ.resolve_coherent(coherent), sampler)
    return impl(scene, state, seeds, offsets, cam2world, screen2cam, px, py,
                jnp.uint32(sampler_seed), lane_active)


# ---------------------------------------------------------------------------
# Sample-axis sharding: every chip renders the FULL image with its own seed
# stream; the accumulation buffers are summed across the mesh (the psum mode
# of SURVEY 2.8's table). Scales spp instead of resolution — better for
# small images where per-chip pixel tiles would underfill the VPU.
# ---------------------------------------------------------------------------


def init_state_spp(width: int, height: int, n: int) -> integ.PathState:
    """Path state with a leading device axis: one full-image path state per
    mesh slot."""
    base = integ.init_state(width, height)
    return jax.tree.map(
        lambda x: jnp.zeros((n,) + x.shape, x.dtype), base
    )


def _spp_spec(x):
    """Sample-sharded leaves: the DEVICE axis is the leading axis."""
    if x.ndim == 0:
        return P()
    return P(AXIS, *([None] * (x.ndim - 1)))


@functools.lru_cache(maxsize=None)
def _spp_impl(mesh, state_specs, axes, width, height, is_persp, direct_only,
              steps, alpha_rounds, coherent, sampler="pcg"):
    """jit(shard_map(...)) for the sample modes. ``axes`` = (sample_axis,
    pixel_axis_or_None): each device (or sample group) owns a slice of
    the leading sample axis; with a pixel axis the per-sample pixel
    arrays are additionally sharded. The per-group launch (sort + trace
    included) is device-local — the vmap over local sample groups is
    degenerate (size 1 per device on a 1D mesh). ``sampler_seeds`` are
    per sample GROUP (derived by the callers): two groups sharing one
    Owen-Sobol seed would draw IDENTICAL stratified jitter and defeat
    the sample-axis scaling."""
    sample_axis, pixel_axis = axes

    def local(scene, state, seeds, offsets, cam2world, screen2cam, px, py,
              sampler_seeds):
        size = jnp.asarray([width, height], jnp.float32)

        def body(st, inp):
            seed, offset = inp  # seed: (local_n,); offset: (2,) shared

            def one(state_i, seed_i, sseed_i):
                return integ.launch_step(
                    scene, state_i, seed_i, offset, cam2world, screen2cam,
                    px, py, size, is_persp=is_persp,
                    direct_only=direct_only, alpha_rounds=alpha_rounds,
                    coherent=coherent, sampler=sampler,
                    sampler_seed=sseed_i,
                )

            return jax.vmap(one, in_axes=(0, 0, 0))(st, seed,
                                                    sampler_seeds), None

        state, _ = jax.lax.scan(body, state, (seeds, offsets), length=steps)
        return state

    pix_spec = P(pixel_axis) if pixel_axis else P()
    sharded = _shard_map(
        local, mesh=mesh,
        in_specs=(P(), state_specs, P(None, sample_axis), P(), P(), P(),
                  pix_spec, pix_spec, P(sample_axis)),
        out_specs=state_specs,
        check_vma=False,
    )
    # state donated (see _pix_impl) — callers must rebind
    return jax.jit(sharded, donate_argnums=(1,))


def _group_sampler_seeds(sampler_seed, n):
    """Stable per-sample-group Owen-Sobol seeds (distinct streams)."""
    g = np.arange(n, dtype=np.uint32) * np.uint32(0x9E3779B9)
    return jnp.asarray(np.uint32(sampler_seed) ^ g ^ (g >> 16))


def render_steps_spp_sharded(scene, state, seeds, offsets, cam2world,
                             screen2cam, mesh: Mesh, *, width, height,
                             is_persp, direct_only, steps, alpha_rounds=0,
                             coherent=None, sampler="pcg", sampler_seed=0):
    """``steps`` launches where each mesh slot advances its OWN full-image
    path state with its own seed (``seeds``: (steps, n) uint32). Combine
    with :func:`reduce_spp` for display."""
    n = mesh.devices.size
    if seeds.shape != (steps, n):
        raise ValueError(f"seeds must be (steps, n)={steps, n}, "
                         f"got {seeds.shape}")
    px, py = _placed_coords(mesh, width, height, P())
    repl = NamedSharding(mesh, P())
    state = jax.tree.map(
        lambda x: _put_once(x, NamedSharding(mesh, _spp_spec(x))), state
    )
    scene = jax.tree.map(lambda x: _put_once(x, repl), scene)
    state_specs = jax.tree.map(_spp_spec, state)
    impl = _spp_impl(mesh, state_specs, (AXIS, None), width, height,
                     is_persp, direct_only, steps, alpha_rounds,
                     integ.resolve_coherent(coherent), sampler)
    return impl(scene, state, seeds, offsets, cam2world, screen2cam, px, py,
                _group_sampler_seeds(sampler_seed, n))


@jax.jit
def reduce_spp(state: integ.PathState) -> integ.PathState:
    """Sums the per-device accumulation (an all-reduce over the mesh axis —
    XLA lowers it to a psum when the input is sample-sharded) and keeps
    slot 0's path-carry fields so the result quacks like a PathState."""
    first = jax.tree.map(lambda x: x[0], state)
    return first._replace(
        accum=tuple(a.sum(axis=0) for a in state.accum),
        count=state.count.sum(axis=0),
    )


# ---------------------------------------------------------------------------
# 2D mesh: samples x pixels. The leading device axis of the spp state is
# sharded over the "samples" mesh axis while every per-pixel axis is
# sharded over "pixels" — tp/dp-style composition: a v5e-8 can run e.g.
# 2 sample groups x 4 pixel shards. Same impl as the spp mode; GSPMD
# partitions the vmap'd launch over both axes.
# ---------------------------------------------------------------------------

SPP_AXIS = "samples"


def make_mesh_2d(n_samples: int, devices=None) -> Mesh:
    """(samples, pixels) mesh using all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % n_samples:
        raise ValueError(f"{n} devices not divisible by {n_samples} sample "
                         "groups")
    arr = np.asarray(devices).reshape(n_samples, n // n_samples)
    return Mesh(arr, (SPP_AXIS, AXIS))


def _spp2d_spec(x):
    """Leading axis = sample groups, last axis = pixels (scalars whole)."""
    if x.ndim == 0:
        return P()
    if x.ndim == 1:
        return P(SPP_AXIS)
    return P(SPP_AXIS, *([None] * (x.ndim - 2)), AXIS)


def render_steps_2d_sharded(scene, state, seeds, offsets, cam2world,
                            screen2cam, mesh: Mesh, *, width, height,
                            is_persp, direct_only, steps, alpha_rounds=0,
                            coherent=None, sampler="pcg", sampler_seed=0):
    """``steps`` launches on a (samples, pixels) mesh.

    ``state`` comes from :func:`init_state_spp` with n = the number of
    SAMPLE groups; ``seeds``: (steps, n_samples). Each sample group owns a
    full-image path state whose pixel axis is additionally sharded over
    the pixel mesh axis. Display via :func:`reduce_spp` (the sum over the
    sample axis lowers to a psum across that mesh dimension).
    """
    n_spp = mesh.shape[SPP_AXIS]
    n_pix = mesh.shape[AXIS]
    p = integ.pixel_count(width, height)
    if p % n_pix:
        raise ValueError(f"pixel count {p} not divisible by pixel axis "
                         f"{n_pix}")
    if seeds.shape != (steps, n_spp):
        raise ValueError(f"seeds must be (steps, n_samples)="
                         f"{steps, n_spp}, got {seeds.shape}")
    px, py = _placed_coords(mesh, width, height, P(AXIS))
    repl = NamedSharding(mesh, P())
    state = jax.tree.map(
        lambda x: _put_once(x, NamedSharding(mesh, _spp2d_spec(x))),
        state)
    scene = jax.tree.map(lambda x: _put_once(x, repl), scene)
    state_specs = jax.tree.map(_spp2d_spec, state)
    impl = _spp_impl(mesh, state_specs, (SPP_AXIS, AXIS), width, height,
                     is_persp, direct_only, steps, alpha_rounds,
                     integ.resolve_coherent(coherent), sampler)
    return impl(scene, state, seeds, offsets, cam2world, screen2cam, px, py,
                _group_sampler_seeds(sampler_seed, n_spp))
