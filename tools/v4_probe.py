"""Phase attribution for the v4 fused-rasterizer frame on chip.

In-jit loops with sequential data dependencies + value digests (the only
reliable methodology through the tunnel — ROUND_NOTES). Measures, at the
bench config (512², 73,728 splats, tile 16, mpt 2048, chunk 128, G 16):

  A) full rasterize_tiled_v4 frame
  B) preprocess + pack_splat_render only
  C) B + build_tile_pairs (binning incl. the pair sort)
  D) C + step maps + the dense step-table gather (everything before
     pallas_call)
  S) the pair co-sort ALONE at the exact binning shape (packed int32 key
     + int32 payload, 460,836 elements)
  S2) the same sort at the live-compacted size (253k) — the payoff bound
      for slot compaction.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussiananything_tpu.data.synthetic import make_object
from gaussiananything_tpu.ops import rasterize as rz
from gaussiananything_tpu.ops.rasterize_pallas import rasterize_tiled_v4
from gaussiananything_tpu.render import cameras

R = 20
RES = 512
TILE, MPT, CHUNK, G, SPG = 16, 2048, 128, 16, 2.7


def loop_time(step, x0, iters=3):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, R, step, x)

    jax.block_until_ready(run(x0))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        ts.append(time.perf_counter() - t0)
    return min(ts) / R * 1e3


def main():
    import sys
    phases = sys.argv[1] if len(sys.argv) > 1 else "ABCEFDS"
    g = make_object(0, n=73728, kind="sphere")
    cam = cameras.pose_to_gs_camera(
        jnp.asarray(cameras.generate_input_camera(1.8, [(20, 45)])[0]))
    cv, cvp, tf = cam["cam_view"], cam["cam_view_proj"], cam["tanfov"]
    bg = jnp.ones(3)

    def phase_A(i, acc):
        out = rasterize_tiled_v4(g + acc * 1e-20, cv, cvp, tf, bg, RES, RES,
                                 tile=TILE, max_per_tile=MPT, chunk=CHUNK,
                                 group=G, steps_per_group=SPG)
        return acc + jnp.sum(out["image"]) * 1e-9

    def phase_B(i, acc):
        sp = rz.preprocess_splats(g + acc * 1e-20, cv, cvp, RES, RES, tf)
        packed = rz.pack_splat_render(sp)
        return acc + jnp.sum(packed) * 1e-9

    def _pairs(acc):
        sp = rz.preprocess_splats(g + acc * 1e-20, cv, cvp, RES, RES, tf)
        pairs, starts, counts, dorder = rz.build_tile_pairs(
            sp, RES, RES, TILE, MPT, rank_pairs=True)
        return sp, pairs, starts, counts, dorder

    def phase_C(i, acc):
        sp, pairs, starts, counts, dorder = _pairs(acc)
        return acc + (jnp.sum(counts) + pairs[123]
                      + dorder[7]).astype(jnp.float32) * 1e-9

    def _step_prep(acc, upto: str):
        """Shared body for the D sub-phases: upto ∈ maps|sid|full."""
        sp, pairs, starts, counts, dorder = _pairs(acc)
        tiles_x = RES // TILE
        n_tiles = tiles_x * (RES // TILE)
        n_groups = n_tiles // G
        n_chunks_max = MPT // CHUNK
        order = jnp.argsort(-counts)
        counts_s = jnp.take(counts, order)
        starts_s = jnp.take(starts, order)
        gmax = counts_s[::G]
        n_act = jnp.clip((gmax + CHUNK - 1) // CHUNK, 1, n_chunks_max)
        cap = int(n_groups * SPG)
        extra = n_act - 1
        cum_prev = jnp.cumsum(extra) - extra
        allowed = jnp.clip(cap - n_groups - cum_prev, 0, extra)
        n_act2 = 1 + allowed
        offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                jnp.cumsum(n_act2).astype(jnp.int32)])
        total = offs[-1]
        mark = jnp.zeros((cap,), jnp.int32).at[offs[1:-1]].add(1, mode="drop")
        step_group = jnp.cumsum(mark)
        step_chunk = (jnp.arange(cap, dtype=jnp.int32)
                      - jnp.take(offs, step_group))
        live = jnp.arange(cap, dtype=jnp.int32) < total
        step_group = jnp.where(live, step_group, n_groups - 1)
        step_chunk = jnp.where(live, step_chunk, n_chunks_max)
        N = g.shape[0]
        packed = rz.pack_splat_render(sp)
        packed_rows = jnp.concatenate(
            [jnp.take(packed, dorder, axis=1),
             jnp.zeros((rz.PACKED_F, 1), jnp.float32)], axis=1).T
        starts_gj = jnp.take(starts_s.reshape(n_groups, G), step_group,
                             axis=0)
        counts_gj = jnp.take(counts_s.reshape(n_groups, G), step_group,
                             axis=0)
        lane = jnp.arange(CHUNK, dtype=jnp.int32)
        pos = step_chunk[:, None, None] * CHUNK + lane[None, None, :]
        slot = starts_gj[:, :, None] + pos
        in_rng = pos < counts_gj[:, :, None]
        if upto == "maps":
            return acc + (jnp.sum(slot) + jnp.sum(packed_rows[3])
                          ).astype(jnp.float32) * 1e-9
        sid = jnp.take(pairs, jnp.where(in_rng, slot, 0).reshape(-1))
        sid = jnp.where(in_rng.reshape(-1), sid, N)
        if upto == "sid":
            return acc + (sid[0] + jnp.sum(packed_rows[3])
                          ).astype(jnp.float32) * 1e-9
        from gaussiananything_tpu.ops.rasterize_pallas import _gather_table
        tab = _gather_table(packed_rows.T, sid, cap, G, CHUNK)
        return acc + jnp.sum(tab[3]) * 1e-9

    def phase_E(i, acc):   # C + step maps only
        return _step_prep(acc, "maps")

    def phase_F(i, acc):   # E + sid gather
        return _step_prep(acc, "sid")

    def phase_D(i, acc):   # full prepare (F + table gather)
        return _step_prep(acc, "full")

    for name, fn in (("B preprocess+pack", phase_B),
                     ("C +binning(sort)", phase_C),
                     ("E +step maps", phase_E),
                     ("F +sid gather", phase_F),
                     ("D +step-table gather", phase_D),
                     ("A full v4 frame", phase_A)):
        if name[0] not in phases:
            continue
        t = loop_time(fn, jnp.float32(0.0))
        extra = f"  ({RES*RES/t*1e-3:.1f} M rays/s)" if name[0] == "A" else ""
        print(f"{name:24s}: {t:7.3f} ms{extra}", flush=True)

    if "S" not in phases:
        return
    # isolated pair sorts at binning shapes
    rng = np.random.default_rng(0)
    for n in (460_836, 253_000, 229_660):
        key = jnp.asarray(rng.integers(0, 1 << 28, size=n), jnp.int32)
        pay = jnp.asarray(rng.integers(0, 1 << 17, size=n), jnp.int32)

        def s_step(i, kp, key=key, pay=pay):
            k, p = kp
            k2, p2 = jax.lax.sort((k ^ (i + 1), p), num_keys=1,
                                  is_stable=False)
            return (k2, p2)

        t = loop_time(s_step, (key, pay))

        def k_step(i, k, key=key):
            return jax.lax.sort(k ^ (i + 1), is_stable=False)

        tk = loop_time(k_step, key)
        print(f"S sort n={n:7d}         : co-sort {t:7.3f} ms | "
              f"key-only {tk:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
