"""E2VID recurrent ConvLSTM-UNet reconstructor, NHWC flax + `lax.scan`.

Reference: ``e2vid/model/unet.py:112-170`` (UNetRecurrent),
``e2vid/model/submodules.py`` (ConvLayer/ConvLSTM/ResidualBlock/
TransposedConvLayer), ``e2vid/image_reconstructor.py:80-123``.

The released ``E2VID_lightweight`` configuration: 5 input bins, 3 encoders,
base 32 channels, 2 residual blocks, sum skips, no norm, transposed-conv
decoders — so encoder widths are 64/128/256 and the latent pyramid is
``{1: head(32), 2: 64, 4: 128, 8: 256}`` (unet.py:163).

TPU-first deltas vs the reference:
- the trainers' Python loop over 20 event windows carrying ``states``
  (finetune_trainer.py:334-338) is compiled as one ``lax.scan``
  (:meth:`E2VIDReconstructor.apply_windows`);
- per-window nonzero event normalization (inference_utils.py:49-86) is fused
  into the scanned step;
- layouts are NHWC and compute dtype is configurable (bf16 on MXU).
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = Any


class ConvTranspose2dTorch(nn.Module):
    """Exact torch ``ConvTranspose2d(k, stride=2, padding=p, output_padding=1)``.

    Implemented as an input-dilated convolution with the flipped kernel:
    pad = (k-1-p, k-1-p+output_padding) on each spatial dim. Output is
    exactly 2x the input size for k=5, p=2, op=1 (submodules.py:39-40).
    """

    features: int
    kernel_size: int = 5
    padding: int = 2
    output_padding: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, p, op = self.kernel_size, self.padding, self.output_padding
        in_ch = x.shape[-1]
        # torch weight layout [in, out, kh, kw]; we store [kh, kw, out, in]
        # and flip spatially at apply time (transpose conv == conv with
        # flipped kernel over dilated input).
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform", in_axis=(3,), out_axis=(2,)),
            (k, k, self.features, in_ch),
        )
        pad_lo = k - 1 - p
        pad_hi = k - 1 - p + op
        # HIGHEST only matters for f32 inputs (keeps the torch-parity
        # tolerance); under bf16 compute the inputs are already rounded and
        # HIGHEST would force a slow multi-pass algorithm for nothing
        prec = (
            None if self.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
        )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            jnp.flip(w, axis=(0, 1)).astype(self.dtype),
            window_strides=(1, 1),
            padding=[(pad_lo, pad_hi), (pad_lo, pad_hi)],
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWOI", "NHWC"),
            precision=prec,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


def space_to_depth(x: Array) -> Array:
    """[B, H, W, C] -> [B, H/2, W/2, 4C] with channel order c*4 + iy*2 + ix.

    TPU layout lever (see docs/ROOFLINE.md): E2VID's head/enc0 activations
    have 5/32 channels, which XLA pads to 128 lanes (25x/4x HBM waste). In
    the 2x2 space-to-depth domain the head produces exactly 128 channels
    and its 5x5 conv becomes an EXACT 3x3 conv (x4 in/out channels), so the
    full-resolution stage runs unpadded.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: Array, channels: int) -> Array:
    """Inverse of :func:`space_to_depth` for channel order o*4 + iy*2 + ix."""
    b, h2, w2, _ = x.shape
    x = x.reshape(b, h2, w2, channels, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h2 * 2, w2 * 2, channels)


@functools.lru_cache(maxsize=None)
def _s2d_index(ci: int, co: int, s2d_out: bool):
    """Constant gather map for :func:`_s2d_kernel`: index into the flattened
    [5,5,ci,co] kernel (with -1 = the appended zero slot) for every element
    of the rewritten [3, 3, 4ci, (4|1)co] kernel."""
    idx = np.full((3, 3, 4 * ci, (4 if s2d_out else 1) * co), -1, np.int32)
    src = np.arange(5 * 5 * ci * co, dtype=np.int32).reshape(5, 5, ci, co)
    for ky in range(5):
        for kx in range(5):
            for by in range(2 if s2d_out else 1):
                for bx in range(2 if s2d_out else 1):
                    vy = by + ky - 2 if s2d_out else ky - 2
                    vx = bx + kx - 2 if s2d_out else kx - 2
                    dy, iy = vy // 2 + 1, vy % 2
                    dx, ix = vx // 2 + 1, vx % 2
                    if s2d_out:
                        idx[dy, dx, iy * 2 + ix :: 4, by * 2 + bx :: 4] = (
                            src[ky, kx]
                        )
                    else:
                        idx[dy, dx, iy * 2 + ix :: 4, :] = src[ky, kx]
    return idx


def _s2d_kernel(w: Array, s2d_out: bool) -> Array:
    """EXACT space-to-depth rewrite of a 5x5 conv kernel [5, 5, Ci, Co].

    ``s2d_out=True``: stride-1 conv, s2d input AND output -> [3, 3, 4Ci, 4Co]
    (the head). ``False``: stride-2 conv, s2d input, standard output ->
    [3, 3, 4Ci, Co] (enc0; the stride is absorbed by the s2d grid).
    Derivation: an original tap at offset v in {-2..3} lands at s2d offset
    dy = v//2 with sub-pixel iy = v%2; each (dy, iy[, by]) combination is a
    disjoint scatter of the original kernel, so the rewritten conv computes
    the identical sum (extra taps are exact zeros). Implemented as ONE
    constant-index gather (not a scatter chain) so the rewrite stays cheap
    even if XLA does not hoist it out of the ``nn.scan`` window loop.
    """
    k, _, ci, co = w.shape
    assert k == 5, k
    idx = _s2d_index(ci, co, s2d_out)
    # -1 wraps to the appended zero slot
    wf = jnp.concatenate([w.reshape(-1), jnp.zeros((1,), w.dtype)])
    return wf[idx]


class _ConvParams(nn.Module):
    """Bare conv parameters with nn.Conv's names/shapes/initializers, for
    layers whose compute path is a transformed kernel (s2d)."""

    kernel_shape: Sequence[int]

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), tuple(self.kernel_shape)
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.kernel_shape[-1],)
        )
        return kernel, bias


class ConvLayer(nn.Module):
    """Conv + optional ReLU (submodules.py:7-31, norm=None in lightweight).

    ``s2d_mode``: 'none' = plain NHWC conv; 'in_out' = 5x5 stride-1 conv
    computed in the 2x2 space-to-depth domain (s2d input and output);
    'in' = 5x5 stride-2 conv on s2d input producing standard output. Both
    are exact kernel rewrites sharing the ORIGINAL parameter shapes, so
    checkpoints are layout-independent.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    relu: bool = True
    dtype: Any = jnp.float32
    s2d_mode: str = "none"

    @nn.compact
    def __call__(self, x):
        if self.s2d_mode == "none":
            y = nn.Conv(
                self.features,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=[(self.padding, self.padding)] * 2,
                use_bias=True,
                dtype=self.dtype,
                name="conv2d",
            )(x)
        else:
            assert self.kernel_size == 5 and self.padding == 2
            in_ch = x.shape[-1] // 4
            w, b = _ConvParams(
                (5, 5, in_ch, self.features), name="conv2d"
            )()
            s2d_out = self.s2d_mode == "in_out"
            assert self.stride == (1 if s2d_out else 2)
            kk = _s2d_kernel(w, s2d_out).astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kk, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            bias = jnp.repeat(b, 4) if s2d_out else b
            y = y + bias.astype(y.dtype)
        return nn.relu(y) if self.relu else y


class ConvLSTMCell(nn.Module):
    """ConvLSTM with a single fused gates conv (submodules.py:175-214).

    Gate order along the output channels is (input, forget, output, cell) —
    matching the reference ``chunk(4)`` order, which matters for converted
    checkpoints.
    """

    hidden: int
    kernel_size: int = 3
    dtype: Any = jnp.float32
    # Opt-in Pallas gate-pointwise kernel (ops/lstm_gates.py). Default OFF:
    # standalone the kernel beats the jnp tail ~3x, but inside the window
    # scan the end-to-end step is UNCHANGED (measured 295.1 jnp vs 293.9 ms
    # fused on v5e, B8 20-window flagship scan) — XLA already fuses the
    # pointwise tail into the scan body, so the microbench win does not
    # compose. Kept as an exactness-tested negative result (docs/ROOFLINE.md)
    # like e2vid_s2d. True forces the kernel (interpret mode off-TPU).
    fused_gates: Optional[bool] = None

    @nn.compact
    def __call__(self, x, state):
        if state is None:
            shape = x.shape[:-1] + (self.hidden,)
            state = (
                jnp.zeros(shape, x.dtype),
                jnp.zeros(shape, x.dtype),
            )
        prev_hidden, prev_cell = state
        pad = self.kernel_size // 2
        gates = nn.Conv(
            4 * self.hidden,
            (self.kernel_size, self.kernel_size),
            padding=[(pad, pad)] * 2,
            dtype=self.dtype,
            name="gates",
        )(jnp.concatenate([x, prev_hidden.astype(x.dtype)], axis=-1))
        if self.fused_gates:
            from openess_tpu.ops.lstm_gates import fused_lstm_gates

            hidden, cell = fused_lstm_gates(
                gates, prev_cell.astype(gates.dtype),
                jax.default_backend() != "tpu",
            )
            return hidden, (hidden, cell)
        i, f, o, g = jnp.split(gates, 4, axis=-1)
        i = nn.sigmoid(i)
        f = nn.sigmoid(f)
        o = nn.sigmoid(o)
        g = nn.tanh(g)
        cell = f * prev_cell.astype(f.dtype) + i * g
        hidden = o * nn.tanh(cell)
        return hidden, (hidden, cell)


class ResidualBlock(nn.Module):
    """3x3 conv -> relu -> 3x3 conv -> +residual -> relu (submodules.py:140-172)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.features, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, name="conv1"
        )(x)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, name="conv2"
        )(y)
        return nn.relu(y + x)


class UNetRecurrent(nn.Module):
    """Recurrent UNet: per-call single event window + carried LSTM states.

    Returns ``(img, states, latent)`` with
    ``latent = {"1": head, "2": enc0, "4": enc1, "8": enc2}`` (unet.py:163).
    """

    num_input_channels: int = 5
    num_output_channels: int = 1
    num_encoders: int = 3
    base_num_channels: int = 32
    num_residual_blocks: int = 2
    dtype: Any = jnp.float32
    # decode=False skips resblocks/decoders/pred and returns img=None. The
    # latent pyramid depends only on head+encoders, and the trainers consume
    # only the latent (trainTaskStep feeds `latent` to SemSegE2VID and
    # discards `img` — finetune_trainer.py:334-338,375-377), so the decode
    # path is dead weight in every training step (~45 % of per-window FLOPs).
    decode: bool = True
    # s2d: input arrives space-to-depth'd ([B, H/2, W/2, 4*bins]) and the
    # head + enc0 convs run in that domain (exact rewrites, identical
    # params), so no full-resolution activation has < 64 channels to
    # lane-pad. latent["1"] is then returned in s2d form [B,H/2,W/2,4*base]
    # — E2VIDReconstructor restores it after the scan.
    s2d: bool = False
    fused_gates: Optional[bool] = None  # see ConvLSTMCell.fused_gates

    @nn.compact
    def __call__(self, x, prev_states: Optional[Sequence] = None):
        base = self.base_num_channels
        enc_out = [base * (2 ** (i + 1)) for i in range(self.num_encoders)]

        x = ConvLayer(
            base, 5, 1, 2, dtype=self.dtype, name="head",
            s2d_mode="in_out" if self.s2d else "none",
        )(x)
        head = x

        if prev_states is None:
            prev_states = [None] * self.num_encoders

        blocks, states = [], []
        for i, out_ch in enumerate(enc_out):
            x = ConvLayer(
                out_ch, 5, 2, 2, dtype=self.dtype,
                name=f"encoders_{i}/conv",
                s2d_mode="in" if (self.s2d and i == 0) else "none",
            )(x)
            x, st = ConvLSTMCell(
                out_ch, 3, dtype=self.dtype,
                fused_gates=self.fused_gates, name=f"encoders_{i}/lstm",
            )(x, prev_states[i])
            blocks.append(x)
            states.append(st)

        latent = {"1": head, "2": blocks[0], "4": blocks[1], "8": blocks[2]}
        if not self.decode:
            return None, states, latent
        if self.s2d:
            head = depth_to_space(head, base)

        for i in range(self.num_residual_blocks):
            x = ResidualBlock(enc_out[-1], dtype=self.dtype, name=f"resblocks_{i}")(x)

        for i in range(self.num_encoders):
            skip = blocks[self.num_encoders - i - 1]
            x = ConvTranspose2dTorch(
                enc_out[self.num_encoders - i - 1] // 2, 5, 2, 1,
                dtype=self.dtype, name=f"decoders_{i}",
            )(x + skip)
            x = nn.relu(x)

        img = ConvLayer(
            self.num_output_channels, 1, 1, 0, relu=False, dtype=self.dtype, name="pred"
        )(x + head)
        img = nn.sigmoid(img)
        return img, states, latent


def normalize_event_window(events: Array) -> Array:
    """Nonzero-mean/std normalization of one event tensor, biased std
    (EventPreprocessor, inference_utils.py:75-86). Operates over the whole
    per-sample tensor."""
    nz = events != 0
    ax = tuple(range(1, events.ndim))
    # stats accumulate in f32 (a bf16 sum over ~1.4M elements saturates);
    # the converts fuse into the reductions, the normalize itself runs in
    # events.dtype so the elementwise stream stays bf16 under bf16 inputs
    ef = events.astype(jnp.float32)
    cnt = jnp.sum(nz, axis=ax, keepdims=True)
    cnt_safe = jnp.maximum(cnt, 1).astype(jnp.float32)
    mean = jnp.sum(jnp.where(nz, ef, 0), axis=ax, keepdims=True) / cnt_safe
    sq = jnp.sum(jnp.where(nz, ef * ef, 0), axis=ax, keepdims=True) / cnt_safe
    std = jnp.sqrt(jnp.maximum(sq - mean * mean, 0.0))
    std_c = jnp.maximum(std, 1e-12).astype(events.dtype)
    mean = mean.astype(events.dtype)
    normed = jnp.where(nz, (events - mean) / std_c, 0.0)
    return jnp.where(cnt > 0, normed, events)


class _RecurrentStep(nn.Module):
    """((states, latent), window) -> ((states, latent), img) for `nn.scan`.

    The latent pyramid rides the CARRY (only the final window's latent is
    consumed downstream), so the scan never materializes a [T, ...] latent
    stack — at production scale (B8, T20, 440x640) that stack is ~5 GB of
    HBM written for nothing. ``img`` is the per-step output (or None when
    ``decode=False``).
    """

    num_bins: int
    normalize: bool
    dtype: Any
    planar: bool = False
    decode: bool = True
    s2d: bool = False
    fused_gates: Optional[bool] = None  # see ConvLSTMCell.fused_gates

    @nn.compact
    def __call__(self, carry, win):
        if self.planar:
            # scan feeds [B, bins*H, W] (bins merged into H — see
            # E2VIDReconstructor: a full-size tensor with a 5-wide dim would
            # let XLA's layout assignment materialize it bins-minor, padding
            # 5 -> 128 lanes: a 23 GB copy at B8 DSEC scale). Split bins back
            # out PER STEP — into the s2d layout (4*bins >= 20 channels)
            # when s2d, else NHWC — so the only small-minor buffer is
            # single-window sized.
            b = win.shape[0]
            bch, w = win.shape[1], win.shape[2]
            h = bch // self.num_bins
            win = jax.lax.optimization_barrier(win)
            win = win.reshape(b, self.num_bins, h, w)
            if self.s2d:
                win = win.reshape(b, self.num_bins, h // 2, 2, w // 2, 2)
                win = win.transpose(0, 2, 4, 1, 3, 5)
                win = win.reshape(b, h // 2, w // 2, 4 * self.num_bins)
            else:
                win = jnp.moveaxis(win, 1, -1)
        elif self.s2d:
            win = space_to_depth(win)
        if self.normalize:
            # nonzero mean/std over the whole window tensor: invariant to
            # the s2d permutation, so normalizing in s2d form is exact
            win = normalize_event_window(win)
        states, _ = carry
        img, states, latent = UNetRecurrent(
            num_input_channels=self.num_bins, dtype=self.dtype,
            decode=self.decode, s2d=self.s2d,
            fused_gates=self.fused_gates, name="unet",
        )(win, states)
        return (tuple(states), latent), img


class E2VIDReconstructor(nn.Module):
    """`lax.scan`-compiled replacement for ``ImageReconstructor`` + the
    trainers' 20-iteration window loop.

    ``__call__(windows)`` takes ``[B, T, H, W, bins]`` voxel windows
    (``planar_input=True``: the ``[B, T, bins, H, W]`` planar TPU wire
    format, transposed per scan step to keep the bins-minor padded buffer at
    single-window size), applies per-window nonzero normalization, scans the
    UNet over T carrying LSTM states (reset at call start, matching the
    reference's ``last_states_for_each_channel = None`` per batch,
    pretrain_trainer.py:387), and returns ``(imgs [B, T, H, W, 1],
    final_latent)`` — trainers consume only the final window's latent
    (pretrain_trainer.py:389-395).
    """

    num_bins: int = 5
    normalize: bool = True
    num_encoders: int = 3
    base_num_channels: int = 32
    dtype: Any = jnp.float32
    planar_input: bool = False
    # latent_only=True (the training configuration) skips the UNet decode
    # path (resblocks + transposed-conv decoders + pred) in every window:
    # the trainers consume only the final latent pyramid, never the
    # reconstructed image, and the decode path is ~45 % of per-window FLOPs.
    # The returned imgs are then None. Checkpoints converted from the
    # released E2VID weights still load — flax ignores the unused
    # decoder/resblock param subtrees.
    latent_only: bool = False
    # scan unroll factor: >1 lets XLA software-pipeline the small per-window
    # convs across recurrence steps
    unroll: int = 1
    # s2d (EXPERIMENTAL, off by default): run the full-resolution stage
    # (head + enc0) in the 2x2 space-to-depth domain — exact conv rewrites
    # with >= 64-channel activations. Parameters and returned shapes are
    # unchanged (latent["1"] is restored after the scan). Requires even
    # H and W; silently disabled otherwise. Measured SLOWER on v5e (B8
    # 440x640 flagship step 711 vs 630 ms): XLA's conv layouts already
    # pack narrow-channel activations spatially, so the hypothesized
    # lane-padding saving does not materialize while the per-window s2d
    # transposes and the +44 % head/enc0 MACs are real (docs/ROOFLINE.md).
    s2d: bool = False
    fused_gates: Optional[bool] = None  # see ConvLSTMCell.fused_gates

    @nn.compact
    def __call__(self, windows: Array):
        if self.planar_input:
            b, t, c, h, w = windows.shape
            # merge bins into H BEFORE the scan-major transpose: every
            # full-size tensor then has only large, tile-friendly dims, so
            # no layout XLA picks can force a 128-lane pad of the 5-wide
            # bins dim (which would cost 25x HBM at production scale)
            windows = windows.reshape(b, t, c * h, w)
        else:
            b, t, h, w = windows.shape[:4]
        s2d = self.s2d and h % 2 == 0 and w % 2 == 0
        states0 = list(initial_stream_state(
            b, h, w, num_encoders=self.num_encoders,
            base_num_channels=self.base_num_channels, dtype=self.dtype,
        ))
        head_shape = (
            (b, h // 2, w // 2, 4 * self.base_num_channels)
            if s2d
            else (b, h, w, self.base_num_channels)
        )
        latent0 = {"1": jnp.zeros(head_shape, self.dtype)}
        for i in range(self.num_encoders):
            latent0[str(2 ** (i + 1))] = jnp.zeros_like(states0[i][0])

        xs = jnp.moveaxis(windows, 1, 0)  # [T, B, ...] scan-major
        scanned = nn.scan(
            _RecurrentStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
            unroll=self.unroll,
        )(
            self.num_bins, self.normalize, self.dtype,
            planar=self.planar_input, decode=not self.latent_only,
            s2d=s2d, fused_gates=self.fused_gates, name="step",
        )
        (_, final_latent), imgs = scanned((tuple(states0), latent0), xs)
        if s2d:
            final_latent = {
                **final_latent,
                "1": depth_to_space(final_latent["1"], self.base_num_channels),
            }
        if imgs is None:
            return None, final_latent
        return jnp.moveaxis(imgs, 0, 1), final_latent


def initial_stream_state(batch: int, height: int, width: int, *,
                         num_encoders: int = 3, base_num_channels: int = 32,
                         dtype: Any = jnp.float32):
    """Zero ConvLSTM states for :class:`E2VIDStreamingStep` — identical to
    the per-call state reset :class:`E2VIDReconstructor` performs at scan
    start (matching the reference's ``last_states_for_each_channel = None``
    per batch, pretrain_trainer.py:387)."""
    states = []
    for i in range(num_encoders):
        ch = base_num_channels * (2 ** (i + 1))
        sh = (batch, height // (2 ** (i + 1)), width // (2 ** (i + 1)), ch)
        states.append((jnp.zeros(sh, dtype), jnp.zeros(sh, dtype)))
    return tuple(states)


class E2VIDStreamingStep(nn.Module):
    """ONE-window streaming form of :class:`E2VIDReconstructor` for serving.

    ``__call__(states, window)`` consumes a planar ``[B, bins, H, W]`` voxel
    window plus the carried ConvLSTM states (zeros from
    :func:`initial_stream_state` at stream start) and returns
    ``(new_states, latent, img)`` — exactly one step of the reconstructor's
    ``nn.scan``, with the SAME parameter tree (``nn.scan`` broadcasts
    params, so a checkpoint loads interchangeably into either module; pinned
    by ``test_streaming_step_matches_scan``). The carry is the LSTM states
    ONLY — the latent pyramid is a per-step OUTPUT, never fed back, so a
    server round-trips ~half the bytes per frame. A real-time server carries
    the states across calls and pays ONE window of compute per frame instead
    of replaying the full T-window history — the reference's only inference
    form re-runs all 20 windows per prediction (base_trainer_ov.py:402-471).
    """

    num_bins: int = 5
    normalize: bool = True
    dtype: Any = jnp.float32
    latent_only: bool = False
    base_num_channels: int = 32
    fused_gates: Optional[bool] = None  # see ConvLSTMCell.fused_gates

    @nn.compact
    def __call__(self, states, window):
        win = jnp.moveaxis(window, 1, -1)  # planar [B, bins, H, W] -> NHWC
        b, h, w = win.shape[:3]
        # placeholder latent carry: _RecurrentStep never reads it
        # (steps.py consumers use only the final OUTPUT latent)
        latent0 = {
            "1": jnp.zeros((b, h, w, self.base_num_channels), self.dtype)
        }
        for i, (c, _) in enumerate(states):
            latent0[str(2 ** (i + 1))] = jnp.zeros_like(c)
        (new_states, latent), img = _RecurrentStep(
            self.num_bins, self.normalize, self.dtype,
            planar=False, decode=not self.latent_only,
            fused_gates=self.fused_gates, name="step",
        )((tuple(states), latent0), win)
        return new_states, latent, img
