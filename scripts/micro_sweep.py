"""Floor test: pure double-buffered DMA sweep over payload rows (no compute).

Isolates the per-tile cost of the fused TSDF kernel's DMA pipeline from its
compute, to attribute the measured ~100 us/tile."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 131072
V = 512
TILE = 32


def sweep_kernel(nt_ref, sdf_any, w_any, c_any, sdf_o, w_o, c_o,
                 in_sdf, in_w, in_c, out_sdf, out_w, out_c, in_sems, out_sems):
    nt = nt_ref[0, 0]

    def in_dmas(t, slot):
        off = pl.multiple_of(t * TILE, TILE)
        return [
            pltpu.make_async_copy(sdf_any.at[pl.ds(off, TILE), :], in_sdf.at[slot], in_sems.at[slot, 0]),
            pltpu.make_async_copy(w_any.at[pl.ds(off, TILE), :], in_w.at[slot], in_sems.at[slot, 1]),
            pltpu.make_async_copy(c_any.at[pl.ds(off, TILE), :], in_c.at[slot], in_sems.at[slot, 2]),
        ]

    def out_dmas(t, slot):
        off = pl.multiple_of(t * TILE, TILE)
        return [
            pltpu.make_async_copy(out_sdf.at[slot], sdf_o.at[pl.ds(off, TILE), :], out_sems.at[slot, 0]),
            pltpu.make_async_copy(out_w.at[slot], w_o.at[pl.ds(off, TILE), :], out_sems.at[slot, 1]),
            pltpu.make_async_copy(out_c.at[slot], c_o.at[pl.ds(off, TILE), :], out_sems.at[slot, 2]),
        ]

    @pl.when(nt > 0)
    def _():
        for d in in_dmas(0, 0):
            d.start()

    @pl.when(nt > 1)
    def _():
        for d in in_dmas(1, 1):
            d.start()

    def body(t, _):
        slot = jax.lax.rem(t, 2)
        for d in in_dmas(t, slot):
            d.wait()

        @pl.when(t >= 2)
        def _():
            for d in out_dmas(t - 2, slot):
                d.wait()

        out_sdf[slot] = in_sdf[slot] * 2.0
        out_w[slot] = in_w[slot] * 1.0
        out_c[slot] = in_c[slot] * 1.0

        for d in out_dmas(t, slot):
            d.start()

        @pl.when(t + 2 < nt)
        def _():
            for d in in_dmas(t + 2, slot):
                d.start()
        return 0

    jax.lax.fori_loop(0, nt, body, 0)

    @pl.when(nt > 0)
    def _():
        for d in out_dmas(nt - 1, jax.lax.rem(nt - 1, 2)):
            d.wait()

    @pl.when(nt > 1)
    def _():
        for d in out_dmas(nt - 2, jax.lax.rem(nt - 2, 2)):
            d.wait()


@jax.jit
def sweep(nt, sdf, w, c):
    return pl.pallas_call(
        sweep_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct(sdf.shape, jnp.float32),
            jax.ShapeDtypeStruct(w.shape, jnp.float32),
            jax.ShapeDtypeStruct(c.shape, jnp.float32),
        ],
        input_output_aliases={1: 0, 2: 1, 3: 2},
        scratch_shapes=[
            pltpu.VMEM((2, TILE, V), jnp.float32),
            pltpu.VMEM((2, TILE, V), jnp.float32),
            pltpu.VMEM((2, TILE, 3 * V), jnp.float32),
            pltpu.VMEM((2, TILE, V), jnp.float32),
            pltpu.VMEM((2, TILE, V), jnp.float32),
            pltpu.VMEM((2, TILE, 3 * V), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(nt, sdf, w, c)


sdf = jnp.ones((N + 1, V), jnp.float32)
w = jnp.zeros((N + 1, V), jnp.float32)
c = jnp.zeros((N + 1, 3 * V), jnp.float32)
for tiles in (64, 128, 512):
    nt = jnp.full((1, 1), tiles, jnp.int32)
    sdf, w, c = jax.block_until_ready(sweep(nt, sdf, w, c))
    t0 = time.perf_counter()
    REP = 20
    for _ in range(REP):
        sdf, w, c = sweep(nt, sdf, w, c)
    jax.block_until_ready((sdf, w, c))
    dt = (time.perf_counter() - t0) / REP
    bw = tiles * TILE * (V * 2 + 3 * V) * 4 * 2 / dt / 1e9
    print(f"tiles={tiles:4d}: {1000*dt:7.2f} ms  ({1e6*dt/tiles:6.1f} us/tile, {bw:.0f} GB/s)",
          "sdf[0,0]:", float(sdf[0, 0]), "sdf[-2,0]:", float(sdf[-2, 0]))
