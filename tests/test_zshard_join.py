"""Joiner for the parallel suite shards (see conftest
pytest_collection_modifyitems): collected LAST (the z name), waits for
every shard subprocess (the golden corpus + fuzzers in group A, the
write/advice/khop-skew/round4 suites in group B) and fails with the
failing shard's output tail if any of its tests failed."""

from __future__ import annotations

import pytest

from conftest import _SHARD


def test_shard_suites_green():
    procs = _SHARD["procs"]
    if not procs:
        pytest.skip("no parallel shard for this selection")
    failures = []
    summaries = []
    for files, proc in procs:
        out, _ = proc.communicate(timeout=1800)
        tail = [ln for ln in out.splitlines() if " passed" in ln]
        summaries.append(
            f"{files[0]}…: {tail[-1].strip() if tail else 'no summary'}"
        )
        if proc.returncode != 0:
            failures.append(
                f"parallel shard ({', '.join(files)}) failed:\n"
                + "\n".join(out.splitlines()[-40:])
            )
    print("; ".join(summaries))
    assert not failures, "\n\n".join(failures)
