#!/usr/bin/env python
"""Regenerate the committed golden parity fixtures (tests/fixtures/*.npz)
from the live torch reference at /root/reference (or
$BSVD_TPU_REFERENCE_ROOT).

Each golden-backed parity test declares its own generator (deterministic
weights/inputs; only reference outputs are stored — see
tests/golden_util.py). This tool simply re-runs every test file that uses
golden_util with BSVD_TPU_REGEN_GOLDEN=1, which forces every generator to
run and rewrite its fixture.

    python tools/make_golden_fixtures.py
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    env = dict(os.environ, BSVD_TPU_REGEN_GOLDEN='1')
    rc = subprocess.call(
        [sys.executable, '-m', 'pytest',
         'tests/test_arch_parity.py', 'tests/test_train_pipeline.py', '-q'],
        cwd=REPO, env=env)
    if rc == 0:
        fixdir = os.path.join(REPO, 'tests', 'fixtures')
        names = sorted(os.listdir(fixdir))
        print(f'regenerated {len(names)} fixtures in {fixdir}:')
        for n in names:
            print(' ', n)
    return rc


if __name__ == '__main__':
    sys.exit(main())
