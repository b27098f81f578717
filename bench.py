"""Benchmark: 256-voice electric piano real-time factor on one TPU chip.

Renders the flagship electric-piano model (the reference's headline
example at 16 voices on CPU, here 256 voices batched on the chip: MIDI →
voice allocator → per-voice 32-harmonic additive voices → stereo tremolo)
and reports rendered audio throughput as a multiple of real time at 48 kHz.

Baseline: the reference publishes no numbers (BASELINE.md); the north-star
target is >= 1000x real time per chip for 256 voices, so
``vs_baseline = value / 1000``.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from oscen_tpu.models.electric_piano import build_electric_piano
    from oscen_tpu.models.poly_synth import build_poly_synth
    from oscen_tpu import raw_midi_event

    NUM_VOICES = 256
    SR = 48_000.0
    BLOCK = 1024  # offline-render block size (amortizes per-block overhead)
    mode = "block"
    model = "electric_piano"
    for a in sys.argv[1:]:
        if a.startswith("--mode="):
            mode = a.split("=", 1)[1]
        if a.startswith("--model="):
            model = a.split("=", 1)[1]

    if model == "electric_piano":
        g = build_electric_piano(NUM_VOICES)
    elif model == "fm_synth":
        from oscen_tpu.models.fm_synth import build_fm_synth
        g = build_fm_synth(NUM_VOICES)
    elif model == "poly_synth":
        g = build_poly_synth(NUM_VOICES)
    elif model == "pivot":
        from oscen_tpu.models.pivot import build_pivot
        g = build_pivot(NUM_VOICES)
    elif model == "readme_synth":
        # BASELINE.md config 1: single-voice README synth
        from oscen_tpu.models.simple import build_simple_synth
        g = build_simple_synth()
        NUM_VOICES = 1
    elif model == "simple_echo":
        # BASELINE.md config 2: oscillator -> feedback delay line
        from oscen_tpu.models.simple import build_simple_echo
        g = build_simple_echo()
        NUM_VOICES = 1
    elif model == "saturator":
        # BASELINE.md config 4: 4x oversampled hard clip (multirate)
        from oscen_tpu.models.simple import build_saturator
        g = build_saturator(factor=4)
        NUM_VOICES = 1
    else:
        raise SystemExit(f"unknown --model={model} (electric_piano, "
                         f"poly_synth, fm_synth, pivot, readme_synth, "
                         f"simple_echo, saturator)")
    synth = g.compile(sample_rate=SR, block_size=BLOCK, mode=mode)

    def audio_of(outs):
        return next(v for v in outs.values() if hasattr(v, "shape"))

    has_midi = any(i.name == "midi_in" for i in synth.ir.inputs)
    # strike a large chord so every voice is active
    for i in range(NUM_VOICES if has_midi else 0):
        synth.queue_event("midi_in", 0, raw_midi_event([0x90, 36 + (i % 64),
                                                        100]))
    # first block carries the events; steady-state rendering follows
    out = synth.process_block()
    jax.block_until_ready(audio_of(out))

    # The tunnel to the chip has a large, fluctuating round-trip latency
    # (0.1-30 ms observed) and limited bandwidth.  steady_checksum renders
    # on device and fetches only a 4-byte energy checksum (forcing all
    # compute); timing two span lengths and subtracting cancels the RTT,
    # leaving pure chip throughput.  best-of-3 on top.
    n_small, n_large = 256, 2048
    for n in (n_small, n_large):  # warmup/compile both variants
        synth.steady_checksum(n)

    def span(n):
        t0 = time.perf_counter()
        synth.steady_checksum(n)
        return time.perf_counter() - t0

    # Median of 5 differences per window (unbiased under fluctuating RTT
    # — min-of-N diffs would overestimate), then best of 5 windows spread
    # over ~45 s: the chip's sustained clock state drifts on second-to-
    # minute scales (the same binary has measured 21.3 and 26.5 us/block
    # an hour apart, and ±2 us within a minute), so spacing the windows
    # samples more states; the best window estimates capability, the
    # median (also reported) the typical state (criterion-style).
    def window():
        diffs = sorted(span(n_large) - span(n_small) for _ in range(5))
        return max(diffs[2], 1e-9)

    windows = []
    for i in range(5):
        if i:
            time.sleep(8)
        windows.append(window())
    windows.sort()
    frames = (n_large - n_small) * BLOCK
    rtf = (frames / SR) / windows[0]          # best window (capability)
    rtf_median = (frames / SR) / windows[len(windows) // 2]  # typical
    result = {
        "metric": f"{model}_{NUM_VOICES}v_rtf_48k",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 1000.0, 4),
        # both views so consumers can see typical vs capability rather
        # than only the optimistic number (chip clock state drifts on
        # multi-second scales; the windows bound the range)
        "median_window": round(rtf_median, 2),
        "us_per_block": round(windows[0] / (n_large - n_small) * 1e6, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    # The TPU relay occasionally drops mid-session (observed: multi-hour
    # "backend setup/compile error (Unavailable)" windows).  A transient
    # failure must not turn the round's one official measurement into a
    # zero — retry with backoff before giving up.
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001 — deliberate catch-all
            if attempt == 2:
                raise
            print(f"[bench attempt {attempt + 1} failed: "
                  f"{type(e).__name__}: {str(e)[:200]} — retrying in "
                  f"{60 * (attempt + 1)}s]", file=sys.stderr, flush=True)
            time.sleep(60 * (attempt + 1))
