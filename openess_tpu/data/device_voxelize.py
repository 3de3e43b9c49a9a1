"""Raw-event-wire -> voxel windows, inside the jitted step.

The production data plane (``tpu.wire_format: raw_events``): datasets ship
the compact sorted-chunk wire (see ``ops/voxelize_chunked.py``) and the
train/eval steps call :func:`voxelize_wire` to build the planar
``[B, T, C, H', W']`` window tensor on-device — the reference's DataLoader
voxelization (``DSEC/dataset/sequence_ov.py:304-305``, ``datasets/
ddd17_events_loader.py:183-196``) moved onto the TPU, where it runs at
~1.2 Gev/s instead of occupying host cores.

Wire batch keys (all batch-sharded on the data mesh axis):
  ev_x, ev_y   int16 [B, T, NBC, E]   fixed-point coords (x32)
  ev_p         uint8 [B, T, NBC, E]
  ev_t         u16|f32 [B, T, NBC, E] time rel. to the window's first event
                                      (u16 = wire v2, quantized against
                                      ev_trange — tpu.wire_t16 default;
                                      f32 = exact v1)
  ev_counts    int32 [B, T, NBC]      valid events per chunk
  ev_r0        int32 [B, T, NBC]      packed chunk descriptor:
                                      row-tile offset | (col-tile offset << 16)
  ev_trange    f32   [B, T]           window time range
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from openess_tpu.config.settings import Settings

WIRE_KEYS = (
    "ev_x", "ev_y", "ev_p", "ev_t", "ev_counts", "ev_r0", "ev_trange",
)


def has_wire(batch) -> bool:
    return "ev_x" in batch


def wire_reuse_ok() -> bool:
    """Whether the packer's double-buffered output reuse is safe here.

    On accelerator backends ``device_put`` copies the host buffer (and
    ``shard_batch`` blocks on the copy), so the loader can recycle wire
    buffers. The CPU backend may alias numpy memory zero-copy — a recycled
    buffer would mutate live device arrays — so reuse stays off there.
    """
    return jax.default_backend() != "cpu"


def pack_wire_batch(wire, batch_size: int, num_windows: int) -> dict:
    """Chunker output tuple -> the ev_* batch keys (the ONE place that knows
    the wire-dict layout; datasets/bench call this)."""
    xq, yq, pq, tr, counts, r0s, trange = wire
    nbc, e = xq.shape[1], xq.shape[2]
    b, t = batch_size, num_windows
    return {
        "ev_x": xq.reshape(b, t, nbc, e),
        "ev_y": yq.reshape(b, t, nbc, e),
        "ev_p": pq.reshape(b, t, nbc, e),
        "ev_t": tr.reshape(b, t, nbc, e),
        "ev_counts": counts.reshape(b, t, nbc),
        "ev_r0": r0s.reshape(b, t, nbc),
        "ev_trange": trange.reshape(b, t),
    }


def voxelize_wire(s: Settings, batch, mesh=None) -> jax.Array:
    """Chunked wire -> planar ``[B, T, C, H_out, W_out]`` voxel windows with
    the dataset's post-ops fused in (DSEC 40-row bottom crop; DDD17
    align-corners resize 346->352 + 60-row crop), matching the host 'grid'
    wire bit-for-semantics (bf16-matmul tolerance).

    With a multi-device ``mesh``, the whole computation runs under
    ``shard_map`` over the data axis: GSPMD has no SPMD rule for the Mosaic
    custom call, so without this it would all-gather the global wire and
    voxelize the full batch on every chip.
    """
    if mesh is not None and mesh.size > 1:
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        args = tuple(batch[k] for k in WIRE_KEYS)
        local = shard_map(
            lambda *a: voxelize_wire(s, dict(zip(WIRE_KEYS, a))),
            mesh=mesh,
            in_specs=(P("data"),) * len(WIRE_KEYS),
            out_specs=P("data"),
            check_rep=False,
        )
        return local(*args)

    from openess_tpu.ops.voxelize_chunked import (
        voxelize_chunked_bilinear_t,
        voxelize_chunked_trilinear,
    )

    b, t, nbc, e = batch["ev_x"].shape
    flat = lambda a: a.reshape((b * t,) + a.shape[2:])
    args = tuple(
        flat(batch[k]) for k in ("ev_x", "ev_y", "ev_p", "ev_t",
                                 "ev_counts", "ev_r0")
    ) + (batch["ev_trange"].reshape(b * t),)
    bins = s.nr_temporal_bins_b
    interp = jax.default_backend() != "tpu"  # portable path off-TPU

    if s.dataset_name_b == "DDD17_events":
        from openess_tpu.data.ddd17 import CROP_BOTTOM, HEIGHT, RESIZE_W, WIDTH
        from openess_tpu.ops.resize import resize_bilinear

        g = voxelize_chunked_bilinear_t(
            *args, num_bins=bins, height=HEIGHT, width=WIDTH,
            separate_pol=s.separate_pol_b, normalize=s.normalize_event_b,
            interpret=interp,
        )  # [B*T, C, 260, 346]
        g = jnp.moveaxis(g, 1, -1)  # NHWC for the torch-exact resize
        g = resize_bilinear(g, out_h=HEIGHT, out_w=RESIZE_W, align_corners=True)
        g = g[:, : HEIGHT - CROP_BOTTOM]
        g = jnp.moveaxis(g, -1, 1)  # planar [B*T, C, 200, 352]
    elif s.dataset_name_b == "DSEC_events":
        from openess_tpu.data.dsec import DSECSequence

        h, w = DSECSequence.HEIGHT, DSECSequence.WIDTH
        g = voxelize_chunked_trilinear(
            *args, num_bins=bins, height=h, width=w,
            normalize=s.normalize_event_b, interpret=interp,
        )
        g = g[:, :, :-40]  # bottom crop (sequence_ov.py:307)
    else:  # synthetic: trilinear at the configured frame size, no crop
        h, w = int(s.img_size_b[0]), int(s.img_size_b[1])
        g = voxelize_chunked_trilinear(
            *args, num_bins=bins, height=h, width=w,
            normalize=s.normalize_event_b, interpret=interp,
        )
    if s.compute_dtype == "bfloat16":
        # Emit the grid in the compute dtype: the E2VID scan consumed bf16
        # windows anyway (flax promoted per window — a 17 ms/step layout
        # copy at DSEC B8, see docs/ROOFLINE.md), and every grid consumer
        # between here and the scan (augmentation flip, planar reshape)
        # now moves half the bytes. Stats-sensitive math downstream
        # (normalize_event_window) accumulates in f32 explicitly.
        g = g.astype(jnp.bfloat16)
    return g.reshape((b, t) + g.shape[1:])
