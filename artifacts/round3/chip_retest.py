"""One-process chip revalidation battery for the session-3 kernels.

Sections (each independent; failures don't stop the rest):
  1. folded-stem parity + timing (gather-built kernel)
  2. fuse sub-op probe incl. the aligned fused pair kernel + XLA variants
  3. fuse_clip end-to-end parity + timing (kernel vs XLA)
  4. decoder pallas-blocks timing (aligned row-dot form)
  5. in_mean block-size timing (cc=1024 vs the former 256)
  6. inference stage profile (cli.profile_stages)
"""
import subprocess
import sys
import time

STEPS = [
    ("stem", "python artifacts/round3/check_stem_chip.py", 1500),
    ("fuse-probe", "python artifacts/round3/probe_fuse.py", 1800),
    ("fuse-e2e", "python artifacts/round3/check_fuse_chip.py", 1500),
    ("decoder", "python artifacts/round3/time_decoder_blocks.py", 1200),
    ("stages", "python -m wacv23_tsnet_tpu.cli.profile_stages", 1500),
]

ok = {}
for name, cmd, to in STEPS:
    print(f"===== {name} =====", flush=True)
    t0 = time.perf_counter()
    r = subprocess.run(["timeout", str(to)] + cmd.split(),
                       cwd="/root/repo")
    ok[name] = r.returncode
    print(f"===== {name} exit {r.returncode} "
          f"({time.perf_counter()-t0:.0f}s) =====", flush=True)

print("SUMMARY:", ok, flush=True)
sys.exit(0 if all(v == 0 for v in ok.values()) else 1)
