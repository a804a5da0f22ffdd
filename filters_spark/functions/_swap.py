"""Atomic directory swap for LSM-style compaction rewrites.

The compaction functions (``retrieval.compact_postings``,
``similarity.compact_ivf`` / ``compact_pq``) stage their rewrite into
a temp directory and then need to make it the live file set.  A
two-step ``move(live, old); move(tmp, live)`` leaves a window where
the live path does not exist — a concurrent reader listing at that
instant fails outright (the round-6 ADVICE finding on
``compact_pq``).  This module provides the single-rename discipline
instead, the same guarantee class as ``sources.versioned._flip_latest``:

* the live path is a SYMLINK to a generation directory
  ``<live>.g<N>`` beside it (relative target, so artifacts stay
  relocatable);
* a swap renames the staged directory to generation N+1, builds a
  temp symlink, and ``os.replace``s it over the live link — ONE
  atomic POSIX rename, so a reader resolving the live path at any
  instant sees the complete old generation or the complete new one,
  never a missing or half-populated directory;
* pre-symlink artifacts (a plain directory at the live path) are
  migrated on first swap — that one-time step still has the old
  rename window; every later swap is atomic.

Previous generations are deleted immediately after the flip: a reader
that already opened its files keeps working (POSIX unlink semantics
on a local/NFS filesystem); one that re-lists mid-delete fails, which
is the same retention contract the old ``.old``-then-delete scheme
had.  Longer retention belongs to the versioned-table vacuum pattern,
not here.  On object stores without rename (S3) this module does not
apply — there the manifest/pointer-file pattern of
``sources/versioned.py`` is the right tool.
"""

from __future__ import annotations

import os
import shutil

__all__ = ["atomic_swap_dir"]


def _generations(live: str) -> list[tuple[int, str]]:
    parent = os.path.dirname(os.path.abspath(live)) or "."
    base = os.path.basename(live)
    out = []
    prefix = base + ".g"
    if not os.path.isdir(parent):
        return out
    for nm in os.listdir(parent):
        if nm.startswith(prefix):
            try:
                out.append((int(nm[len(prefix):]), os.path.join(parent, nm)))
            except ValueError:
                continue
    return sorted(out)


def atomic_swap_dir(live: str, staged: str) -> None:
    """Atomically make ``staged``'s contents the file set at ``live``.

    ``staged`` is consumed (renamed to the next generation dir).
    Safe against concurrent READERS of ``live``; concurrent WRITERS
    (two simultaneous compactions of one artifact) are not supported
    — compaction is a maintenance operation run one-at-a-time.
    """
    live = os.path.abspath(live)
    if (not os.path.islink(live)) and os.path.isdir(live):
        # one-time migration of a pre-symlink artifact; this step has
        # the legacy non-atomic window, all subsequent swaps do not.
        g0 = live + ".g0"
        shutil.rmtree(g0, ignore_errors=True)
        os.rename(live, g0)
        os.symlink(os.path.basename(g0), live)
    gens = _generations(live)
    nxt = gens[-1][0] + 1 if gens else 0
    newgen = f"{live}.g{nxt}"
    os.rename(staged, newgen)
    tmp_link = live + ".swap"
    if os.path.lexists(tmp_link):
        os.remove(tmp_link)
    os.symlink(os.path.basename(newgen), tmp_link)
    os.replace(tmp_link, live)  # the atomic flip
    current = os.path.realpath(live)
    for _, p in _generations(live):
        if os.path.realpath(p) != current:
            shutil.rmtree(p, ignore_errors=True)
