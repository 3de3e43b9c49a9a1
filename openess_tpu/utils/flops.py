"""Analytic FLOP accounting for the flagship step.

XLA's ``compiled.cost_analysis()`` counts a ``lax.scan`` BODY ONCE, not
times its trip count — so any cost built around the E2VID 20-window
recurrence under-reports by ~20x on the dominant term (this produced the
bogus "10% MFU" of round 2; see docs/ROOFLINE.md). The helpers here count
the recurrent UNet analytically so benchmarks can correct the XLA number:

    true_flops = cost_analysis_flops + (T - 1) * e2vid_window_flops(...)

(cost_analysis already includes ONE body's worth).
"""
from __future__ import annotations


def conv_flops(px: int, k: int, cin: int, cout: int) -> int:
    """2 * MACs of a k x k conv evaluated at ``px`` output pixels."""
    return 2 * px * k * k * cin * cout


def e2vid_window_flops(
    batch: int, height: int, width: int, *, num_bins: int = 5,
    base: int = 32, num_encoders: int = 3, num_residual_blocks: int = 2,
    decode: bool = True,
) -> int:
    """Forward FLOPs of ONE UNetRecurrent window (models/e2vid.py).

    The three ConvLSTM gate convs dominate: each level computes 4*hidden
    output channels from concat(input, hidden) with a 3x3 kernel — ~0.33 TF
    per level at B8 DSEC scale regardless of resolution (channel doubling
    cancels the 4x pixel reduction).

    ``decode=False`` counts the latent-only training configuration
    (E2VIDReconstructor(latent_only=True)): head + encoders only, no
    resblocks/decoders/pred.
    """
    h, w = height, width
    px = batch * h * w
    total = conv_flops(px, 5, num_bins, base)              # head
    ch = base
    for i in range(num_encoders):
        out = base * (2 ** (i + 1))
        px = batch * (h // 2 ** (i + 1)) * (w // 2 ** (i + 1))
        total += conv_flops(px, 5, ch, out)                # strided encoder
        total += conv_flops(px, 3, 2 * out, 4 * out)       # ConvLSTM gates
        ch = out
    if not decode:
        return total
    px8 = batch * (h // 2 ** num_encoders) * (w // 2 ** num_encoders)
    for _ in range(num_residual_blocks):
        total += 2 * conv_flops(px8, 3, ch, ch)            # resblock convs
    for i in range(num_encoders):
        cin = base * (2 ** (num_encoders - i))
        px = batch * (h // 2 ** (num_encoders - i - 1)) * (
            w // 2 ** (num_encoders - i - 1)
        )
        # transposed conv == k5 conv over the 2x-dilated input: only ~1/4 of
        # taps land on real samples
        total += conv_flops(px, 5, cin, cin // 2) // 4
        cin //= 2
    total += conv_flops(batch * h * w, 1, base, 1)         # pred
    return total
