"""Extension registry (reference ``filters/extensions.py::
FilterExtensionRegistry`` — SURVEY.md §2.7).

Third-party validators register via the entry-point group
``filters_spark.extensions`` (the modern ``importlib.metadata``
analog of the reference's setuptools ``filters.extensions`` group),
or programmatically via :meth:`Registry.register`.  Discovered
validators are exposed as ``filters_spark.ext.<Name>``.
"""

from __future__ import annotations

from importlib import metadata

from .core import Validator, coerce

ENTRY_POINT_GROUP = "filters_spark.extensions"


class Registry:
    def __init__(self):
        self._factories: dict[str, object] = {}
        self._discovered = False

    def register(self, name: str, factory) -> None:
        self._factories[name] = factory

    def _discover(self) -> None:
        if self._discovered:
            return
        self._discovered = True
        try:
            eps = metadata.entry_points(group=ENTRY_POINT_GROUP)
        except Exception:
            eps = []
        for ep in eps:
            try:
                self._factories.setdefault(ep.name, ep.load())
            except Exception:
                continue  # a broken extension must not break the engine

    def names(self) -> list[str]:
        self._discover()
        return sorted(self._factories)

    def __getattr__(self, name: str) -> Validator:
        self._discover()
        try:
            factory = self._factories[name]
        except KeyError:
            raise AttributeError(
                f"no extension validator {name!r}; registered: {self.names()}"
            ) from None
        try:
            return coerce(factory)
        except TypeError:
            # Parameterized validator class (e.g. ext.Pick) — hand back
            # the factory itself so callers instantiate: ext.Pick([...]).
            return factory


registry = Registry()
