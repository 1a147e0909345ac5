"""The ONE mode-to-stream-delta derivation for the tablelog commit log.

What a streaming read of version v delivers — its ``new_files`` — and
which deletion-vector files are NEW at v (``dv_new``, the change feed's
delete delivery) are pure functions of the version doc and the previous
version's (files, dv) sets. These rules used to be hand-duplicated in
three places (``tablelog.write_checkpoint``'s history loop, the
stream planner's doc-walk tail in ``stream_source._version_rows``, and
implicitly in the checkpoint head decode's field names) — any future
mode or rule change in one silently desyncs checkpoint-planned streams
from doc-walk streams (ADVICE r13). Both writers now call
:func:`version_delta`; the checkpoint head decode only copies the
fields this function produced at write time (same names:
``new_files`` / ``dv_new`` / ``dv``), so there is no third derivation.

This module is deliberately dependency-free (no pyspark, no pyarrow):
the stream planner runs in Python DataSource planning workers with no
JVM, and the checkpoint writer runs on the driver.

The rules (pinned by the seeded log-shape property test in
``tests/test_tablelog.py`` and the checkpoint-vs-docwalk equivalence
tests):

* ``append`` — delta = the files not present in the previous version
  (the previous live set is carried forward, only the new dirs ship).
* ``overwrite`` — delta = the WHOLE file list, never a prev-diff:
  ``restore()`` re-publishes OLD paths, so restore-over-shared-files
  (e.g. restore-to-v0 right after a delete) would otherwise compute an
  EMPTY delta and silently deliver zero rows to fresh change feeds —
  the r13 silent-data-loss catch (commit 4b0bb6c). Fresh-dir
  overwrites are unchanged by this rule: their files never intersect
  the previous version's.
* ``delete`` — delta = no data files (a deletion-vector version keeps
  the same live files); ``dv_new`` = the vector files not already
  carried at the previous version.
* ``merge`` (X144, Delta's DV-backed MERGE) — BOTH deltas at once:
  the appended postimage/insert files (files not in prev) AND the new
  deletion vectors naming the matched preimages (dv not in prev_dv).
  The change feed delivers a merge as delete rows + insert rows in
  one version — the upsert case the overwrite refusal used to push to
  batch ``table_changes(keys=...)``.
* snapshot-masking vectors (``dv0``): vectors can name a version's
  OWN files only for a cloned/restored v0 or a restored overwrite
  (commit appends never vector their new files) — snapshot deliveries
  of those versions must mask them or clone/restore-deleted rows
  resurrect in streams while batch reads exclude them (review r13).
"""

from __future__ import annotations


def version_delta(
    version: int,
    mode: str,
    files: list[str],
    dv: list[str],
    prev_files: set[str],
    prev_dv: set[str],
) -> tuple[list[str], list[str], list[str]]:
    """(new_files, dv_new, snapshot_dv) for one committed version.

    ``new_files``: the data files a streaming read of this version
    delivers. ``dv_new``: the deletion-vector files first published at
    this version (the change feed's delete delivery plans from these).
    ``snapshot_dv``: the vectors a SNAPSHOT delivery of this version
    must mask (non-empty only for v0 or an overwrite that carries
    vectors — clone()/restore() publishes).
    """
    if mode == "delete":
        new_files: list[str] = []
        dv_new = [f for f in dv if f not in prev_dv]
    elif mode == "overwrite":
        new_files = list(files)
        dv_new = []
    elif mode == "merge":
        # both deltas: appended postimage/insert files AND the new
        # vectors naming the matched preimages (matched against the
        # pre-merge view, so the vectors never name this version's
        # own new files)
        new_files = [f for f in files if f not in prev_files]
        dv_new = [f for f in dv if f not in prev_dv]
    else:
        new_files = [f for f in files if f not in prev_files]
        dv_new = []
    snapshot_dv = list(dv) if dv and (version == 0 or mode == "overwrite") else []
    return new_files, dv_new, snapshot_dv
