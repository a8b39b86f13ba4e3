"""Model registry auto-population + factory
(reference: BasicSR/basicsr/models/__init__.py:5-30)."""

import importlib
import pkgutil

from bsvd_tpu.models.base_model import BaseModel, build_model, latest_resume_state  # noqa: F401

for _m in pkgutil.iter_modules(__path__):
    if _m.name.endswith('_model') and _m.name != 'base_model':
        importlib.import_module(f'bsvd_tpu.models.{_m.name}')
