"""Fused ConvLSTM gate pointwise as a Pallas TPU kernel.

The reference ConvLSTM (``e2vid/model/submodules.py:175-214``) computes, per
window, ``i,f,o,g = chunk(gates_conv(cat(x, h)), 4)`` followed by the gate
nonlinearities and the state update. Inside the 20-window scan XLA lowers
that pointwise tail to three kLoop fusions (one per encoder level) that run
at ~20 % of the HBM roofline — measured 2.22 / 1.43 / 1.43 ms per window at
DSEC B8 enc0/1/2 vs a ~0.6 / 0.3 / 0.16 ms roofline (docs/ROOFLINE.md), or
~101 ms of a 524 ms step. Two causes:

- XLA's elementwise window iteration over the ``{3,0,2,1}``-tiled operands
  is far from the VPU's streaming rate, and at enc0 (hidden=64) every
  128-lane tile is half padding;
- the ``jnp.split`` gate slices sit at 64-lane offsets inside the tiles.

This kernel streams the same math at near-roofline: measured (chained
microbench, same shapes) 1.77 / 0.24 / 0.09 ms per window standalone.

**Negative result — OFF by default** (``tpu: e2vid_fused_gates``): inside
the actual 20-window scan the end-to-end time is UNCHANGED (295.1 ms jnp
vs 293.9 ms fused, v5e B8 flagship scan forward). The standalone jnp
numbers above measure isolated dispatches; in the compiled scan body XLA
fuses the gate tail into adjacent convolution epilogues, so the kLoop cost
the microbench observes is not additive in context and the kernel only
relocates work. Kept as an exactness-tested opt-in (tests/test_lstm_gates
.py) and documented in docs/ROOFLINE.md alongside the e2vid_s2d negative
result.

On-hardware numerics: interpret mode matches the jnp path to f32
round-off (the CPU tests assert 1e-6), but on a real TPU the Mosaic
lowering of sigmoid/tanh uses slightly different polynomial
approximations than XLA's elementwise lowering, so fused-vs-jnp latents
drift ~5e-4 after a few recurrence windows (measured on v5e at 440x640,
T=3). Within bf16 training noise, but do not expect bit-identity between
the two gate paths on hardware.

Layout contract: the scan-internal conv outputs carry the physical layout
``{3,0,2,1}`` (C minor, then B, W, H major); the logical
``[B,H,W,C] -> [H, W*B, C]`` view is therefore a free bitcast on TPU, and
the kernel consumes it directly, blocking only the leading H dim (every
block spans the full W*B/C dims, so the Mosaic last-two-dims (8, 128)
divisibility rule is met by construction, and the sublane dim stays large
for any batch size — including B=1 init/streaming).

The op carries a ``jax.custom_vjp`` whose backward is a second Pallas
kernel recomputing the (cheap) gate activations from the saved conv output
— needed only by the ``unfrozen_e2vid`` fine-tuning path
(finetune_trainer.py:207-214); pretraining stops gradients at the latent
(pretrain_trainer.py:551-552) so the scan is forward-only there.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BLOCK_BYTES = 6 * 1024 * 1024  # gates block target (excl. double buffer)


def _pick_hb(h: int, w: int, b: int, c4: int, itemsize: int) -> int:
    """Largest divisor of ``h`` whose gates block stays under _BLOCK_BYTES."""
    per_row = w * b * c4 * itemsize
    best = 1
    for hb in range(1, h + 1):
        if h % hb == 0 and hb * per_row <= _BLOCK_BYTES:
            best = hb
    return best


def _fwd_kernel(g_ref, pc_ref, h_ref, c_ref, *, C):
    g4 = g_ref[:].astype(jnp.float32)
    pc = pc_ref[:].astype(jnp.float32)
    i = jax.nn.sigmoid(g4[..., :C])
    f = jax.nn.sigmoid(g4[..., C:2 * C])
    o = jax.nn.sigmoid(g4[..., 2 * C:3 * C])
    g = jnp.tanh(g4[..., 3 * C:])
    c = f * pc + i * g
    h = o * jnp.tanh(c)
    h_ref[:] = h.astype(h_ref.dtype)
    c_ref[:] = c.astype(c_ref.dtype)


def _bwd_kernel(g_ref, pc_ref, dh_ref, dcn_ref, dg_ref, dpc_ref, *, C):
    g4 = g_ref[:].astype(jnp.float32)
    pc = pc_ref[:].astype(jnp.float32)
    dh = dh_ref[:].astype(jnp.float32)
    dcn = dcn_ref[:].astype(jnp.float32)
    i = jax.nn.sigmoid(g4[..., :C])
    f = jax.nn.sigmoid(g4[..., C:2 * C])
    o = jax.nn.sigmoid(g4[..., 2 * C:3 * C])
    g = jnp.tanh(g4[..., 3 * C:])
    c = f * pc + i * g
    th = jnp.tanh(c)
    dc = dcn + dh * o * (1.0 - th * th)
    dgi = (dc * g) * i * (1.0 - i)
    dgf = (dc * pc) * f * (1.0 - f)
    dgo = (dh * th) * o * (1.0 - o)
    dgg = (dc * i) * (1.0 - g * g)
    dg_ref[:] = jnp.concatenate([dgi, dgf, dgo, dgg], axis=-1).astype(
        dg_ref.dtype
    )
    dpc_ref[:] = (dc * f).astype(dpc_ref.dtype)


def _hwbc(x):
    # [B, H, W, C] -> [H, W*B, C]: a free bitcast on TPU when the producer
    # carries the scan-internal conv layout {3,0,2,1} (C minor, then B, W,
    # H). Collapsing (W, B) keeps the kernel's sublane dim large for ANY
    # batch size — a 4-D [H, W, B, C] view puts B in the sublane dim, which
    # at B=1 (init, streaming serving) leaves registers 1/8 used and made
    # Mosaic spill >100 MB of VMEM.
    b, h, w, c = x.shape
    return jnp.transpose(x, (1, 2, 0, 3)).reshape(h, w * b, c)


def _bhwc(x, b):
    h, wb, c = x.shape
    return jnp.transpose(x.reshape(h, wb // b, b, c), (2, 0, 1, 3))


def _run(kernel, out_widths, arrays, interpret):
    h, wb, c4 = arrays[0].shape
    hb = _pick_hb(h, wb, 1, c4, arrays[0].dtype.itemsize)
    widths = [a.shape[-1] for a in arrays] + list(out_widths)
    specs = [
        pl.BlockSpec((hb, wb, cw), lambda r: (r, 0, 0)) for cw in widths
    ]
    n_in = len(arrays)
    return pl.pallas_call(
        kernel,
        grid=(h // hb,),
        in_specs=specs[:n_in],
        out_specs=specs[n_in:],
        out_shape=[
            jax.ShapeDtypeStruct((h, wb, cw), arrays[0].dtype)
            for cw in out_widths
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*arrays)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_lstm_gates(gates: Array, prev_cell: Array, interpret: bool = False):
    """``(hidden, cell)`` from fused gate conv output + previous cell.

    Args: ``gates`` ``[B, H, W, 4C]`` in reference chunk order (i, f, o, g),
    ``prev_cell`` ``[B, H, W, C]``. Same math as the jnp path in
    ``ConvLSTMCell`` (sigmoid/tanh in f32, results in input dtype).
    """
    h, c = _vjp_fwd(gates, prev_cell, interpret)[0]
    return h, c


def _vjp_fwd(gates, prev_cell, interpret):
    b = gates.shape[0]
    C = prev_cell.shape[-1]
    kern = functools.partial(_fwd_kernel, C=C)
    h, c = _run(kern, (C, C), [_hwbc(gates), _hwbc(prev_cell)], interpret)
    return (_bhwc(h, b), _bhwc(c, b)), (gates, prev_cell)


def _vjp_bwd(interpret, res, cot):
    gates, prev_cell = res
    dh, dcn = cot
    b = gates.shape[0]
    C = prev_cell.shape[-1]
    kern = functools.partial(_bwd_kernel, C=C)
    dg, dpc = _run(
        kern, (4 * C, C),
        [_hwbc(gates), _hwbc(prev_cell), _hwbc(dh), _hwbc(dcn)],
        interpret,
    )
    return _bhwc(dg, b), _bhwc(dpc, b)


fused_lstm_gates.defvjp(_vjp_fwd, _vjp_bwd)
