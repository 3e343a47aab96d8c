"""Run the TPU-gated golden parity set on the real chip, each round.

tests/conftest.py pins pytest to a virtual CPU mesh, so the Pallas
cluster-sweep render path (the one bench.py times) is never executed by a
plain `pytest` run — the teapot 512 goldens skip there. This runner flips
the CGE_TPU_TESTS=1 switch and executes exactly the TPU-gated cases
(teapot_accel_512 and teapot_bench_512 — the bench feature set,
shading,hard_shadow,recursive,normal_interp,accel) on the axon/TPU backend,
making the kernel-path parity check automatable (VERDICT r3 item 4).

Usage: PYTHONPATH=. python tools/tpu_goldens.py [extra pytest args]
Exit code is pytest's — nonzero on any mismatch or on an unexpected skip.
"""
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CASES = [
    "tests/test_golden_images.py::test_golden_image_512[teapot_accel_512]",
    "tests/test_golden_images.py::test_golden_image_512[teapot_bench_512]",
    "tests/test_golden_images.py::test_golden_dragon_scale_256",
]


def main() -> int:
    env = dict(os.environ, CGE_TPU_TESTS="1")
    cmd = [sys.executable, "-m", "pytest", "-v", "-rs",
           *CASES, *sys.argv[1:]]
    proc = subprocess.run(cmd, cwd=REPO, env=env,
                          capture_output=True, text=True)
    sys.stdout.write(proc.stdout[-4000:])
    sys.stderr.write(proc.stderr[-2000:])
    if proc.returncode != 0:
        return proc.returncode
    # a silent skip (missing golden, backend fell back to CPU) must not
    # read as a pass — that was exactly round 3's blind spot. Parse counts
    # from the WHOLE output, not a fixed summary-line position (warnings
    # summaries / plugins shift it, ADVICE r4), and demand that every
    # listed case actually PASSED.
    m_skip = re.search(r"(\d+) skipped", proc.stdout)
    m_pass = re.search(r"(\d+) passed", proc.stdout)
    n_pass = int(m_pass.group(1)) if m_pass else 0
    if m_skip or n_pass != len(CASES):
        print(f"FAIL: TPU goldens must run all {len(CASES)} cases "
              f"(passed={n_pass}, skipped={m_skip.group(1) if m_skip else 0})",
              file=sys.stderr)
        return 3
    return 0


if __name__ == "__main__":
    sys.exit(main())
