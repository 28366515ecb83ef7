"""Joiner for the parallel suite shard (see conftest
pytest_collection_modifyitems): collected LAST (the z name), waits for
the shard subprocess running the golden corpus + fuzz suites, and
fails with the shard's output tail if any of its tests failed."""

from __future__ import annotations

import pytest

from conftest import _SHARD


def test_shard_suites_green():
    proc = _SHARD["proc"]
    if proc is None:
        pytest.skip("no parallel shard for this selection")
    out, _ = proc.communicate(timeout=1800)
    assert proc.returncode == 0, (
        f"parallel shard ({', '.join(_SHARD['files'])}) failed:\n"
        + "\n".join(out.splitlines()[-40:])
    )
    tail = [ln for ln in out.splitlines() if " passed" in ln]
    print(f"shard: {tail[-1].strip() if tail else 'no summary'}")
