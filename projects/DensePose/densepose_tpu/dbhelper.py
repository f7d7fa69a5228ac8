"""Dataset-entry selectors for DB inspection tooling.

Counterpart of the reference's ``densepose/utils/dbhelper.py``: a tiny
query language for picking entries out of a dataset's list-of-dicts,
used by ``query_db.py``.  Grammar (reference :28-44)::

    <specifiers> ::= <specifier>[,<specifiers>]
    <specifier>  ::= <field_name>[:<type>]=<value_or_range>
    <value_or_range> ::= <value> | <value>-<value>

``"*"`` selects everything.  ``<type>`` is any builtin type name
(``int``/``str``/``float``); equality is checked after coercing the spec
value to that type, ranges are closed intervals.
"""

import builtins
from typing import Any, Callable, Dict, List

__all__ = ["EntrySelector", "AllEntrySelector", "FieldEntrySelector"]


class EntrySelector:
    """Base: a predicate over dataset entries (dicts)."""

    @staticmethod
    def from_string(spec: str) -> "EntrySelector":
        if spec == AllEntrySelector.SPECIFIER:
            return AllEntrySelector()
        return FieldEntrySelector(spec)


class AllEntrySelector(EntrySelector):
    SPECIFIER = "*"

    def __call__(self, entry) -> bool:
        return True


def _coerce(typename: str) -> Callable[[str], Any]:
    return getattr(builtins, typename) if typename else str


class FieldEntrySelector(EntrySelector):
    """AND of per-field equality / closed-range predicates."""

    def __init__(self, spec: str):
        self._predicates: List[Callable[[Dict[str, Any]], bool]] = []
        for sub in spec.split(","):
            name_type, eq, value = sub.partition("=")
            if eq != "=" or not name_type:
                raise ValueError(
                    f"Invalid field selector specifier: {sub!r}, expected "
                    "<field>[:<type>]=<value> or <field>[:<type>]=<min>-<max>"
                )
            name, _, typename = name_type.partition(":")
            if not name:
                raise ValueError(
                    f"Invalid field selector specifier: {sub!r}, field name is empty"
                )
            cast = _coerce(typename)
            lo, dash, hi = value.partition("-")
            if dash and lo:  # range (a leading '-' is a negative value, not a range)
                self._predicates.append(self._range_predicate(name, cast, lo, hi))
            else:
                self._predicates.append(self._value_predicate(name, cast, value))

    @staticmethod
    def _value_predicate(name, cast, value):
        return lambda entry: entry[name] == cast(value)

    @staticmethod
    def _range_predicate(name, cast, lo, hi):
        return lambda entry: cast(lo) <= entry[name] <= cast(hi)

    def __call__(self, entry: Dict[str, Any]) -> bool:
        return all(p(entry) for p in self._predicates)
