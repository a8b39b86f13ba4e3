"""Name -> implementation registries.

The registry is the framework's plugin mechanism: arch/model/dataset/loss/metric
implementations register themselves by class (or function) name at import time
and YAML configs select them with a ``type:`` key, mirroring the reference
framework's five global registries (reference: BasicSR/basicsr/utils/registry.py:4-82).
"""


class Registry:
    """A name -> object mapping supporting decorator-style registration.

    Example::

        ARCH_REGISTRY = Registry('arch')

        @ARCH_REGISTRY.register()
        class BSVD: ...

        cls = ARCH_REGISTRY.get('BSVD')
    """

    def __init__(self, name):
        self._name = name
        self._obj_map = {}

    def _do_register(self, name, obj, suffix=None):
        if isinstance(suffix, str):
            name = name + '_' + suffix
        if name in self._obj_map:
            raise KeyError(f"An object named '{name}' was already registered "
                           f"in '{self._name}' registry!")
        self._obj_map[name] = obj

    def register(self, obj=None, suffix=None):
        if obj is None:
            def deco(func_or_class):
                self._do_register(func_or_class.__name__, func_or_class, suffix)
                return func_or_class
            return deco
        self._do_register(obj.__name__, obj, suffix)
        return obj

    def get(self, name, suffix='bsvd_tpu'):
        ret = self._obj_map.get(name)
        if ret is None and isinstance(suffix, str):
            ret = self._obj_map.get(name + '_' + suffix)
        if ret is None:
            raise KeyError(f"No object named '{name}' found in '{self._name}' registry! "
                           f"Available: {sorted(self._obj_map)}")
        return ret

    def __contains__(self, name):
        return name in self._obj_map

    def __iter__(self):
        return iter(self._obj_map.items())

    def keys(self):
        return self._obj_map.keys()


ARCH_REGISTRY = Registry('arch')
MODEL_REGISTRY = Registry('model')
DATASET_REGISTRY = Registry('dataset')
LOSS_REGISTRY = Registry('loss')
METRIC_REGISTRY = Registry('metric')
