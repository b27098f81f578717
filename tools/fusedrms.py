"""Measure the fused additive kernel's deviation from the exact op order
ON THE BENCH CONFIG (256 voices, 48 kHz, full chord struck and held).

VERDICT r03 item 3: the headline perf number (fused v4 kernel) and the
headline tolerance (1e-6-class, sample-mode/parity paths) described
different code paths.  This tool closes the gap with data: it renders the
flagship chord through the fused v4 kernel and through the exact-op-order
``parity`` kernel (bit-class match to sample mode, see
tests/test_electric_piano.py::test_additive_parity_env_selectable) on the
SAME device, same events, same block size, and reports RMS / max-abs of
the difference per second of audio, plus an A/B over the subgroup anchor
length (OSCEN_ADDITIVE_SUB = 64/32/16) — smaller subgroups shorten the
closed-form recurrence each anchor replaces, trading serial work for
tightness.

Each config runs in its own subprocess: OSCEN_ADDITIVE_SUB is resolved at
trace time, so an in-process env flip would silently hit the jit cache.

Run on TPU (default env) or CPU (OSCEN_PALLAS_INTERPRET=1, small -v).

  python tools/fusedrms.py [--voices=256] [--block=1024] [--seconds=2]
"""
import os
import subprocess
import sys
import tempfile

import numpy as np

_CHILD = """
import os, sys, numpy as np
sys.path.insert(0, %(repo)r)
from oscen_tpu.models.electric_piano import build_electric_piano
from oscen_tpu import raw_midi_event

voices, block, seconds = %(voices)d, %(block)d, %(seconds)f
g = build_electric_piano(voices)
s = g.compile(sample_rate=48_000.0, block_size=block, mode="block")
for i in range(voices):
    s.queue_event("midi_in", 0, raw_midi_event([0x90, 36 + (i %% 64), 100]))
s.process_block()  # event block (composed path in both kernels)
n_blocks = max(1, int(seconds * 48_000.0 / block))
out = [np.asarray(s.process_block()["out"]) for _ in range(n_blocks)]
np.save(%(out)r, np.concatenate(out, axis=0))
"""


def render(kernel: str, sub: int, voices: int, block: int,
           seconds: float) -> np.ndarray:
    env = dict(os.environ)
    env["OSCEN_ADDITIVE_KERNEL"] = kernel
    env["OSCEN_ADDITIVE_SUB"] = str(sub)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.NamedTemporaryFile(suffix=".npy", delete=False) as f:
        out = f.name
    src = _CHILD % dict(repo=repo, voices=voices, block=block,
                        seconds=seconds, out=out)
    subprocess.run([sys.executable, "-c", src], env=env, check=True,
                   timeout=600)
    y = np.load(out)
    os.unlink(out)
    return y


def main():
    voices, block, seconds = 256, 1024, 2.0
    for a in sys.argv[1:]:
        if a.startswith("--voices="):
            voices = int(a.split("=")[1])
        if a.startswith("--block="):
            block = int(a.split("=")[1])
        if a.startswith("--seconds="):
            seconds = float(a.split("=")[1])

    ref = render("parity", 64, voices, block, seconds)
    scale = float(np.sqrt(np.mean(ref ** 2)))
    print(f"# config: {voices}v B={block} {seconds}s chord; "
          f"signal RMS={scale:.4g}", flush=True)
    for sub in (64, 32, 16):
        got = render("v4", sub, voices, block, seconds)
        d = got - ref
        rms = float(np.sqrt(np.mean(d ** 2)))
        print(f"v4 SUB={sub:3d}: rms={rms:.3e} ({rms / scale:.3e} rel)  "
              f"max_abs={float(np.max(np.abs(d))):.3e}", flush=True)


if __name__ == "__main__":
    main()
