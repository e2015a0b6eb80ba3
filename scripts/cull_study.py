"""Pure-numpy study: survivor-union statistics for the v4 kernel design.

For group sizes {128, 256, 512, 1024} rays and cluster sizes {16, 32, 64,
128} tris, reports mean/max surviving clusters per group (exact per-ray
slab-test union) on 1M incoherent rays, sorted by cluster-hit signature.
The product  union * cluster_size  is the tri tests per ray the kernel
pays; the per-ray mean of the mask is the unreachable lower bound.

No jax import — runs anywhere fast.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def cluster_aabbs(v0, e1, e2, order, csize):
    F = v0.shape[0]
    v = np.stack([v0, v0 + e1, v0 + e2], axis=1)[order]  # sorted corners
    M = (F + csize - 1) // csize
    lo = np.full((M, 3), 1e30, np.float32)
    hi = np.full((M, 3), -1e30, np.float32)
    for c in range(M):
        s, e = c * csize, min((c + 1) * csize, F)
        pts = v[s:e].reshape(-1, 3)
        lo[c] = pts.min(0)
        hi[c] = pts.max(0)
    return lo, hi


def slab(lo, hi, org, d, chunk=65536):
    out = []
    for s in range(0, org.shape[0], chunk):
        o = org[s:s + chunk]
        dd = d[s:s + chunk]
        inv = 1.0 / np.where(np.abs(dd) < 1e-12, 1e-12, dd)
        t0 = (lo[None] - o[:, None]) * inv[:, None]
        t1 = (hi[None] - o[:, None]) * inv[:, None]
        tnear = np.minimum(t0, t1).max(-1)
        tfar = np.maximum(t0, t1).min(-1)
        out.append((tnear <= tfar * 1.00000024) & (tfar >= 0.0))
    return np.concatenate(out)


def main():
    from pbrlab_tpu.scene.demo import build_demo_scene

    subdiv = int(os.environ.get("KB_SUBDIV", "3"))
    scene, _ = build_demo_scene(subdiv=subdiv)
    v0, e1, e2 = scene["tri_v0"], scene["tri_e1"], scene["tri_e2"]
    F = v0.shape[0]
    # scene is already Morton-sorted at commit; order = identity
    order = np.arange(F)
    print(f"tris={F}")

    rng = np.random.default_rng(0)
    N = 1 << 20
    lo_s, hi_s = scene["aabb_min"], scene["aabb_max"]
    org = (lo_s + (hi_s - lo_s) * rng.random((N, 3))).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    for csize in (16, 32, 64, 128):
        lo, hi = cluster_aabbs(v0, e1, e2, order, csize)
        mask = slab(lo, hi, org, d)
        M = mask.shape[1]
        per_ray = mask.sum(1)
        # signature sort: bit-fold mask into a key, stable sort
        key = np.zeros(N, np.uint64)
        for c in range(min(M, 64)):
            key |= mask[:, c].astype(np.uint64) << np.uint64(c % 64)
        perm = np.argsort(key, kind="stable")
        ms = mask[perm]
        line = [f"csize={csize:4d} M={M:4d} tris/ray(min)="
                f"{per_ray.mean() * csize:7.0f}"]
        for g in (128, 256, 512, 1024):
            u = ms.reshape(-1, g, M).any(1).sum(1)
            line.append(f"g{g}: u={u.mean():6.2f} tests={u.mean() * csize:6.0f}")
        print("  ".join(line))
        # unsorted 1024 for contrast
        uu = mask.reshape(-1, 1024, M).any(1).sum(1)
        print(f"             unsorted g1024: u={uu.mean():.2f} "
              f"tests={uu.mean() * csize:.0f}  dense={F}")


if __name__ == "__main__":
    main()


def sah_study():
    """Compare SAH-leaf clustering (tight boxes, padded slots) vs Morton."""
    from pbrlab_tpu.geometry.bvh import build_bvh
    from pbrlab_tpu.scene.demo import build_demo_scene

    subdiv = int(os.environ.get("KB_SUBDIV", "3"))
    scene, _ = build_demo_scene(subdiv=subdiv)
    v0, e1, e2 = scene["tri_v0"], scene["tri_e1"], scene["tri_e2"]
    F = v0.shape[0]
    bmin = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    bmax = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)

    rng = np.random.default_rng(0)
    N = 1 << 20
    lo_s, hi_s = scene["aabb_min"], scene["aabb_max"]
    org = (lo_s + (hi_s - lo_s) * rng.random((N, 3))).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    for csize in (16, 32, 64):
        bvh = build_bvh(bmin, bmax, leaf_size=csize, use_native=False)
        leaf = bvh.prim_offset >= 0
        lo = bvh.aabb_min[leaf]
        hi = bvh.aabb_max[leaf]
        M = lo.shape[0]
        fill = (bvh.prim_ids.reshape(-1, csize) >= 0).sum(1).mean()
        mask = slab(lo, hi, org, d)
        per_ray = mask.sum(1)
        key = np.zeros(N, np.uint64)
        for c in range(min(M, 64)):
            key |= mask[:, c].astype(np.uint64) << np.uint64(c % 64)
        perm = np.argsort(key, kind="stable")
        ms = mask[perm]
        line = [f"SAH csize={csize:3d} M={M:4d} fill={fill:5.1f} "
                f"slots/ray(min)={per_ray.mean() * csize:6.0f}"]
        for g in (128, 1024):
            u = ms.reshape(-1, g, M).any(1).sum(1)
            line.append(f"g{g}: u={u.mean():6.2f} slots={u.mean() * csize:6.0f}")
        print("  ".join(line))


if __name__ == "__main__":
    if os.environ.get("SAH") == "1":
        sah_study()
