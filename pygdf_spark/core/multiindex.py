"""Minimal MultiIndex — the COLUMN-label half of cuDF's MultiIndex
(reference core/multiindex.py:1, 1,702 LoC).

The engine's row identity is positional (an explicit order column), so
the row-label MultiIndex has no analog here: group keys stay ordinary
columns after groupby/agg (the documented convention). What cuDF-shaped
code does hit immediately is the MULTI-LEVEL COLUMN labels that
``groupby(...).agg({col: [fn, ...]})`` and multi-agg pivots produce —
``out[("x", "sum")]``, ``out.columns.to_flat_index()``, and the
``out.columns = [...]`` flatten-rename idiom. This class carries exactly
that surface as a lightweight tuple list; the physical Spark columns
stay flat strings.
"""

from __future__ import annotations

from collections.abc import Iterable


class MultiIndex:
    """An ordered list of equal-length label tuples with level names."""

    def __init__(self, tuples: Iterable[tuple], names: Iterable[str | None] | None = None):
        self._tuples = [tuple(t) for t in tuples]
        if self._tuples:
            width = len(self._tuples[0])
            assert all(len(t) == width for t in self._tuples), "ragged label tuples"
        self.names = list(names) if names is not None else [None] * self.nlevels

    # -- constructors (multiindex.py from_tuples/from_arrays) ----------
    @classmethod
    def from_tuples(cls, tuples, names=None) -> "MultiIndex":
        return cls(tuples, names)

    @classmethod
    def from_arrays(cls, arrays, names=None) -> "MultiIndex":
        return cls(zip(*arrays), names)

    # -- shape ---------------------------------------------------------
    @property
    def nlevels(self) -> int:
        return len(self._tuples[0]) if self._tuples else 0

    @property
    def levels(self) -> list[list]:
        """Unique labels per level, first-seen order (cuDF sorts by
        appearance for column indexes)."""
        out = []
        for i in range(self.nlevels):
            seen: dict = {}
            for t in self._tuples:
                seen.setdefault(t[i], None)
            out.append(list(seen))
        return out

    def get_level_values(self, level: int) -> list:
        return [t[level] for t in self._tuples]

    # -- flattening (the rename convention) ----------------------------
    def to_flat_index(self) -> list:
        """Tuples as-is, pandas-style (callers usually join with '_')."""
        return list(self._tuples)

    def flat_names(self, sep: str = "_") -> list[str]:
        """The engine's physical-name convention: non-empty parts joined
        with ``sep`` ('' level labels — plain key columns — drop out)."""
        return [sep.join(str(p) for p in t if p != "") for t in self._tuples]

    # -- level ops (multiindex.py swaplevel/droplevel) -----------------
    def _level_num(self, level) -> int:
        """Resolve a level by position or name."""
        if isinstance(level, int):
            return level + self.nlevels if level < 0 else level
        if level in self.names:
            return self.names.index(level)
        raise KeyError(f"level {level!r} not found (names={self.names})")

    def swaplevel(self, i=-2, j=-1) -> "MultiIndex":
        """Swap two label levels (reference core/multiindex.py
        swaplevel)."""
        a, b = self._level_num(i), self._level_num(j)

        def sw(t):
            t = list(t)
            t[a], t[b] = t[b], t[a]
            return tuple(t)

        names = list(self.names)
        names[a], names[b] = names[b], names[a]
        return MultiIndex([sw(t) for t in self._tuples], names)

    def droplevel(self, level=0) -> "MultiIndex | list":
        """Remove one label level; collapses to a plain label list when
        one level remains (pandas/cuDF behavior)."""
        k = self._level_num(level)
        if self.nlevels <= 2:
            return [t[1 - k] for t in self._tuples]
        names = [n for i, n in enumerate(self.names) if i != k]
        return MultiIndex(
            [tuple(p for i, p in enumerate(t) if i != k) for t in self._tuples], names
        )

    # -- container protocol --------------------------------------------
    def __iter__(self):
        return iter(self._tuples)

    def __len__(self) -> int:
        return len(self._tuples)

    def __getitem__(self, i):
        return self._tuples[i]

    def __contains__(self, t) -> bool:
        return tuple(t) in self._tuples

    def __eq__(self, other) -> bool:
        if isinstance(other, MultiIndex):
            return self._tuples == other._tuples
        return self._tuples == [tuple(t) for t in other]

    def __repr__(self) -> str:
        return f"MultiIndex({self._tuples!r}, names={self.names!r})"
