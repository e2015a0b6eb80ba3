"""In-loop floor decomposition of the refill-render while_loop body.

Round-4 found ~4.3 ms/iteration of loop body that neither overlaps nor
shows in isolated probes (ARCHITECTURE.md "path to 100" #2); the floors
behind that number were measured with throwaway /tmp scripts. This is the
committed version: each probe runs a while_loop whose body is an
INCREMENTAL composition of the real loop's stages over the real packed
carry, so the difference between consecutive probes prices one stage IN
CONTEXT (same carry, same cond, same iteration structure).

Axon-tunnel rules (scripts/step_profile.py): AOT-compile everything,
burn a sacrificial execution, run each program once, difference two
iteration counts (ITER_A vs ITER_B) so dispatch + trace overhead cancel.

Env: LF_LANES (65536), LF_ITERS (64), PBRLAB_*.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pbrlab_tpu.render.integrator import (compact_packed, init_state,
                                          pack_state, unpack_state,
                                          wavefront_step, _signature_word)
from pbrlab_tpu.scene.demo import build_demo_scene
from pbrlab_tpu.scene.scene import build_fat_tables, scene_to_device

N = int(os.environ.get("LF_LANES", "65536"))
SIDE = int(np.sqrt(N))
ITER_A = 4
ITER_B = ITER_A + int(os.environ.get("LF_ITERS", "64"))


def build_probes(scene, spp=8):
    """Each probe: (tag, body_fn(packed, fb, next_pixel, it) -> same)."""
    from pbrlab_tpu.core import rng as prng
    from pbrlab_tpu.render.camera import generate_rays

    n = N * 4  # pretend framebuffer is 4x the lane count

    def p_carry(packed, fb, np_, it):
        # carry + cond only: the loop's irreducible floor
        return packed + 1e-30, fb, np_, it + 1

    def p_signature(packed, fb, np_, it):
        sig = _signature_word(scene, packed[:, 3:6], packed[:, 0:3],
                              packed[:, 6])
        packed = packed.at[:, 14].set(
            lax.bitcast_convert_type(sig, jnp.float32))
        return packed, fb, np_, it + 1

    def p_sort(packed, fb, np_, it):
        # signature + argsort (no gather)
        sig = _signature_word(scene, packed[:, 3:6], packed[:, 0:3],
                              packed[:, 6])
        perm = jnp.argsort(sig)
        packed = packed.at[:, 14].set(
            lax.bitcast_convert_type(perm.astype(jnp.uint32), jnp.float32))
        return packed, fb, np_, it + 1

    def p_compact(packed, fb, np_, it):
        # the full production compaction (signature + argsort + gather)
        return compact_packed(packed, scene), fb, np_, it + 1

    def p_scatter(packed, fb, np_, it):
        # compaction + the flush test + fb scatter-add only
        st = unpack_state(packed)
        flush = ~st.alive & (st.sample < spp)
        contrib = jnp.where(flush[..., None], st.contribution, 0.0)
        fb = fb.at[jnp.minimum(st.lane, n - 1)].add(contrib)
        st = st._replace(contribution=jnp.where(flush[..., None], 0.0,
                                                st.contribution))
        return compact_packed(pack_state(st), scene), fb, np_, it + 1

    def p_claim(packed, fb, np_, it):
        # + the cumsum-rank pixel claim (no camera/PCG)
        st = unpack_state(packed)
        flush = ~st.alive & (st.sample < spp)
        contrib = jnp.where(flush[..., None], st.contribution, 0.0)
        fb = fb.at[jnp.minimum(st.lane, n - 1)].add(contrib)
        want = flush & (st.sample + 1 >= spp)
        rank = jnp.cumsum(want.astype(jnp.int32)) - 1
        newp = np_ + rank
        got = want & (newp < n)
        p_loc = jnp.where(got, newp, st.lane)
        np_ = jnp.minimum(np_ + want.sum(dtype=jnp.int32), jnp.int32(n))
        st = st._replace(contribution=jnp.where(flush[..., None], 0.0,
                                                st.contribution),
                         lane=p_loc)
        return compact_packed(pack_state(st), scene), fb, np_, it + 1

    def p_refill(packed, fb, np_, it):
        # compaction + the refill body (flush/claim/camera/PCG)
        st = unpack_state(packed)
        flush = ~st.alive & (st.sample < spp)
        contrib = jnp.where(flush[..., None], st.contribution, 0.0)
        fb = fb.at[jnp.minimum(st.lane, n - 1)].add(contrib)
        want = flush & (st.sample + 1 >= spp)
        rank = jnp.cumsum(want.astype(jnp.int32)) - 1
        newp = np_ + rank
        got = want & (newp < n)
        p_loc = jnp.where(got, newp, st.lane)
        np_ = jnp.minimum(np_ + want.sum(dtype=jnp.int32), jnp.int32(n))
        rng0 = prng.seed_state(p_loc.astype(jnp.uint32), jnp.uint32(1), 0)
        rng0, (u1, u2) = prng.draw_n(rng0, 2)
        org0, dir0 = generate_rays(scene, SIDE, SIDE, u1, u2,
                                   jnp.minimum(p_loc, N - 1))
        nd = (flush | got)[..., None]
        st = st._replace(org=jnp.where(nd, org0, st.org),
                         direction=jnp.where(nd, dir0, st.direction),
                         rng=jnp.where(flush | got, rng0, st.rng),
                         lane=p_loc)
        return compact_packed(pack_state(st), scene), fb, np_, it + 1

    def p_full(packed, fb, np_, it):
        # refill-equivalent + the REAL wavefront step + compaction:
        # should reproduce render_profile's full ms/iter
        st = unpack_state(packed)
        st = wavefront_step(scene, st, 0)
        return compact_packed(pack_state(st), scene), fb, np_, it + 1

    def p_step_nocompact(packed, fb, np_, it):
        st = unpack_state(packed)
        st = wavefront_step(scene, st, 0)
        return pack_state(st), fb, np_, it + 1

    return [("carry+cond", p_carry),
            ("signature", p_signature),
            ("sig+sort", p_sort),
            ("compact(full)", p_compact),
            ("compact+scatter", p_scatter),
            ("compact+claim", p_claim),
            ("compact+refill", p_refill),
            ("step only", p_step_nocompact),
            ("step+compact", p_full)]


def main():
    scene_np, _ = build_demo_scene(subdiv=3)
    scene_host = scene_to_device(scene_np)

    @jax.jit
    def mk_state(scene):
        s = build_fat_tables(scene)
        st = init_state(s, SIDE, SIDE, jnp.uint32(0), 0)
        st = wavefront_step(s, st, 0)
        st = wavefront_step(s, st, 0)
        return pack_state(st)

    packed0 = jax.block_until_ready(mk_state(scene_host))
    fb0 = jnp.zeros((N * 4, 3), jnp.float32)

    def make(body, iters):
        def run(scene, packed):
            s = build_fat_tables(scene)
            probes = {t: f for t, f in build_probes(s)}
            fn = probes[body]

            def cond(c):
                return c[3] < iters

            def loop_body(c):
                return fn(c[0], c[1], c[2], c[3])

            packed, fb, _, _ = lax.while_loop(
                cond, loop_body,
                (packed, fb0, jnp.int32(0), jnp.int32(0)))
            return packed.sum() + fb.sum()

        return jax.jit(run)

    # These while_loop probes ALSO hit the second-execution
    # INVALID_ARGUMENT backend bug -> every program executes exactly once.
    # Two independently compiled (A, B) pairs per probe (iter counts
    # offset by 1 -> distinct executables) give two dt estimates; take
    # the min. A burn-in of distinct tiny programs sheds the decaying
    # post-compile penalty before anything is timed.
    tags = [t for t, _ in build_probes(build_fat_tables(scene_host))]
    jobs = []
    for tag in tags:
        pair = []
        t0 = time.perf_counter()
        for off in (0, 1):
            fa = make(tag, ITER_A + off)
            fb = make(tag, ITER_B + off)
            fa.lower(scene_host, packed0).compile()
            fb.lower(scene_host, packed0).compile()
            pair.append((fa, fb))
        print(f"compiled {tag} ({time.perf_counter() - t0:.0f}s)",
              file=sys.stderr)
        jobs.append((tag, pair))

    for it in (2, 3):  # burn-in: distinct programs, executed once each
        sac = make(tags[0], it)
        sac.lower(scene_host, packed0).compile()
        np.asarray(sac(scene_host, packed0))

    def wall(f):
        t0 = time.perf_counter()
        np.asarray(f(scene_host, packed0))
        return time.perf_counter() - t0

    prev = 0.0
    for tag, pair in jobs:
        dts, walls = [], []
        for fa, fb in pair:
            ta, tb = wall(fa), wall(fb)
            dts.append((tb - ta) / (ITER_B - ITER_A))
            walls += [ta, tb]
        dt = min(dts)
        print(f"{tag:16s} {dt * 1e3:7.3f} ms/iter  (delta "
              f"{(dt - prev) * 1e3:+7.3f})  [dts "
              f"{', '.join(f'{d * 1e3:.3f}' for d in dts)}; walls "
              f"{', '.join(f'{w * 1e3:.0f}' for w in walls)}]",
              file=sys.stderr)
        prev = dt


if __name__ == "__main__":
    main()
