"""fvcore.common.registry shim.

Surface per detectron2/utils/registry.py and the modeling build
registries (META_ARCH_REGISTRY etc.): register (decorator or direct),
get, __contains__, __iter__.
"""

from typing import Any, Dict, Iterable, Iterator, Tuple


class Registry(Iterable[Tuple[str, Any]]):
    def __init__(self, name: str) -> None:
        self._name = name
        self._obj_map: Dict[str, Any] = {}

    def _do_register(self, name: str, obj: Any) -> None:
        assert name not in self._obj_map, (
            f"An object named '{name}' was already registered in "
            f"'{self._name}' registry!"
        )
        self._obj_map[name] = obj

    def register(self, obj: Any = None) -> Any:
        if obj is None:
            def deco(func_or_class: Any) -> Any:
                self._do_register(func_or_class.__name__, func_or_class)
                return func_or_class

            return deco
        self._do_register(obj.__name__, obj)
        return obj

    def get(self, name: str) -> Any:
        ret = self._obj_map.get(name)
        if ret is None:
            raise KeyError(
                f"No object named '{name}' found in '{self._name}' registry!"
            )
        return ret

    def __contains__(self, name: str) -> bool:
        return name in self._obj_map

    def __repr__(self) -> str:
        return f"Registry of {self._name}: {sorted(self._obj_map)}"

    def __iter__(self) -> Iterator[Tuple[str, Any]]:
        return iter(self._obj_map.items())

    __str__ = __repr__
