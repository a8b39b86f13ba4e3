"""Golden-fixture layer for parity tests.

The reference repo's de-facto regression anchor is reproducing published
numbers from fixed checkpoints (reference README.md:65-71). With no
checkpoint shippable, the equivalent here is small committed golden tensors:
each parity test pins its reference-side outputs in ``tests/fixtures/`` so
parity holds even when /root/reference (or torch) is absent.

Weights and inputs are DETERMINISTIC on both sides (jax PRNG / numpy RNG
seeds), so a fixture stores only the reference's *outputs* — a few tens of
KB per test.

Protocol: a test calls ``golden(name, generate)``.
- fixture file exists and BSVD_TPU_REGEN_GOLDEN unset -> load it;
- else run ``generate()`` against the live torch reference (the generator
  skips the test when it is unavailable), and write the fixture when
  BSVD_TPU_REGEN_GOLDEN=1 (see tools/make_golden_fixtures.py).
"""

import os

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'fixtures')


def golden(name, generate):
    """Return a dict of numpy arrays for fixture ``name`` (see module doc)."""
    path = os.path.join(FIXTURE_DIR, name + '.npz')
    regen = bool(os.environ.get('BSVD_TPU_REGEN_GOLDEN'))
    if os.path.exists(path) and not regen:
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    data = {k: np.asarray(v) for k, v in generate().items()}
    if regen:
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        np.savez_compressed(path, **data)
    return data
