"""Commit-log filename utilities — CommitLogUtil.java analog.

Reference: core/.../CommitLogUtil.java:28-159 — filename regexes for
``CommitLog-<version>-<timestamp>.log`` and the ``_cdc.idx`` twin, directory
listing filtered to real commit logs, timestamp-based ordering, and guarded
move/delete (a non-commit-log path must never be moved or deleted by the
archiver; reference CommitLogUtilTest).

The engine's native log layout is ``segment_id=N/`` parquet partitions, but
a deployment bridging a real ``cdc_raw`` directory needs exactly these
helpers: recognize real segment files, order them, and map their timestamps
onto engine segment ids (``segment_alias_map``).
"""

from __future__ import annotations

import os
import re
import shutil

LOG_RE = re.compile(r"^CommitLog-\d+-(\d+)\.log$")
IDX_RE = re.compile(r"^CommitLog-\d+-(\d+)_cdc\.idx$")


def extract_timestamp(filename: str, index: bool = False) -> int:
    """The <timestamp> component, or raise — mirrors extractTimestamp:159."""
    m = (IDX_RE if index else LOG_RE).match(os.path.basename(filename))
    if not m:
        kind = "index" if index else "commit log"
        raise ValueError(f"not a {kind} filename: {filename!r}")
    return int(m.group(1))


def is_commit_log(filename: str) -> bool:
    return LOG_RE.match(os.path.basename(filename)) is not None


def is_index(filename: str) -> bool:
    return IDX_RE.match(os.path.basename(filename)) is not None


def get_commit_logs(directory: str) -> list[str]:
    """Commit-log files in the directory, ordered by timestamp
    (getCommitLogs:105 + compareCommitLogs ordering)."""
    out = [f for f in os.listdir(directory) if is_commit_log(f)]
    return sorted(out, key=extract_timestamp)


def get_indexes(directory: str) -> list[str]:
    out = [f for f in os.listdir(directory) if is_index(f)]
    return sorted(out, key=lambda f: extract_timestamp(f, index=True))


def compare_commit_logs(a: str, b: str) -> int:
    """-1/0/1 by the timestamp component (compareCommitLogs:128-148)."""
    ta, tb = extract_timestamp(a), extract_timestamp(b)
    return (ta > tb) - (ta < tb)


def move_commit_log(path: str, to_dir: str) -> bool:
    """Move ONLY if the file is a commit log; a non-matching name is left in
    place (moveCommitLog:40 — the archiver must never relocate foreign
    files). Returns whether a move happened."""
    if not is_commit_log(path):
        return False
    shutil.move(path, os.path.join(to_dir, os.path.basename(path)))
    return True


def delete_commit_log(path: str) -> bool:
    """Delete ONLY a commit-log file (deleteCommitLog:74). Returns whether a
    delete happened; a non-commit-log path raises."""
    if not is_commit_log(path):
        raise ValueError(f"refusing to delete non-commit-log file: {path!r}")
    os.remove(path)
    return True


def segment_alias_map(directory: str) -> dict[str, int]:
    """Real commit-log filename -> engine segment id: files order by their
    timestamp component and receive dense ids 0..n-1 — the bridge between a
    real ``cdc_raw`` directory and the engine's ``segment_id=N`` layout."""
    return {f: i for i, f in enumerate(get_commit_logs(directory))}
