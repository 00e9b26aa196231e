"""Quota-exchange variants at the A=6M GlobalRoute shapes, on the TPU.

T0: current glue  — slice [:, :n*Q] + transpose + zero-pad-set   (Q=80)
T1: padded grids  — pure reshape/transpose/reshape               (Q=96)
T2: lane-aligned  — pure reshape/transpose/reshape               (Q=128)
T3: no exchange   — pallas reduce-side strided DMA: per dst chunk,
    DMA qt[:, d, :] (row-stride R1) straight into VMEM, bypassing the
    transpose entirely (the E4 candidate for GlobalRoute).
"""

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

N1, N2 = 8, 24
NS = 451  # real chunks at A=6M
NP = 512  # padded


def delta_time(make_fn, tag):
    try:
        f1 = jax.jit(make_fn(N1))
        f2 = jax.jit(make_fn(N2))
        d = []
        for f in (f1, f2, f1, f2):
            out = f()
            t0 = time.perf_counter()
            np.asarray(out)
            d.append(time.perf_counter() - t0)
        d1, d2 = min(d[0], d[2]), min(d[1], d[3])
        ms = (d2 - d1) / (N2 - N1) * 1e3
        print(f"{tag}: {ms:.2f} ms/iter  (d1={d1:.2f}s d2={d2:.2f}s)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)


def t0_current(n):
    Q, R1, R3 = 80, 384, 384
    y0 = jnp.ones((NS, R1 * 128), jnp.float32)

    def f():
        def body(i, y1):
            t = y1[:, : NS * Q]
            y2 = jnp.transpose(
                t.reshape(NS, NS, Q), (1, 0, 2)
            ).reshape(NS, NS * Q)
            zg = jnp.zeros((NS, R3 * 128), y1.dtype)
            zg = zg.at[:, : NS * Q].set(y2)
            return y1 * 0.999 + zg * 1e-30
        return jax.lax.fori_loop(0, n, body, y0)[0, :8]
    return f


def t_pure(Q):
    def mk(n):
        y0 = jnp.ones((NP, NP * Q), jnp.float32)

        def f():
            def body(i, y1):
                y2 = jnp.transpose(
                    y1.reshape(NP, NP, Q), (1, 0, 2)
                ).reshape(NP, NP * Q)
                return y1 * 0.999 + y2 * 1e-30
            return jax.lax.fori_loop(0, n, body, y0)[0, :8]
        return f
    return mk


def t3_dma(n):
    """Strided-read kernel: out[d] rows = qt[:, d, :] via manual DMA."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R1 = NP  # rows per src chunk (Q_rows=1, d-major rows)
    qt0 = jnp.ones((NS, R1, 128), jnp.float32)

    def kernel(qt_ref, out_ref, buf, sem):
        d = pl.program_id(0)
        dma = pltpu.make_async_copy(
            qt_ref.at[:, d, :], buf.at[:NS], sem
        )
        dma.start()
        dma.wait()
        out_ref[:, :] = buf[:, :] * 2.0

    def run(qt):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NS * NP, 128), jnp.float32),
            grid=(NS,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((NP, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((NP, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(qt)

    def f():
        def body(i, qt):
            y = run(qt)
            return qt * 0.999 + y[: NS, None, :].reshape(NS, 1, 128) * 1e-30
        return jax.lax.fori_loop(0, n, body, qt0)[0, 0, :8]
    return f


def main():
    delta_time(t0_current, "T0 current glue (Q=80, slice+T+pad)")
    delta_time(t_pure(96), "T1 pure transpose Q=96")
    delta_time(t_pure(128), "T2 pure transpose Q=128")
    delta_time(t3_dma, "T3 strided-DMA read (no exchange)")


if __name__ == "__main__":
    main()
