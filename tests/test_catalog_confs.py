"""Once-per-session runtime-conf application in catalog.load_table.

The marker conf is the primary memo; these tests pin the FALLBACK path for
sessions whose conf surface raises (round-7 advice): without the WeakSet
memo, every load_table call would re-apply RUNTIME_CONFS and silently
clobber deliberate caller overrides made between calls.
"""

from __future__ import annotations

import pytest

from feature_datalake_sl_mandic_spark import catalog

SF_SMALL = "/root/testdata/sf0.001"


class _RaisingConf:
    def get(self, *a, **k):
        raise RuntimeError("conf surface unavailable")

    def set(self, *a, **k):
        raise RuntimeError("conf surface unavailable")


class _RaisingConfProxy:
    """Session wrapper whose conf surface always raises; everything else
    delegates to the real session (read, sparkContext, ...)."""

    def __init__(self, inner):
        self._inner = inner
        self.conf = _RaisingConf()

    def __getattr__(self, name):
        return getattr(self._inner, name)


@pytest.fixture
def counting_apply(monkeypatch):
    calls = []
    monkeypatch.setattr(catalog, "apply_runtime_confs", lambda s: calls.append(s))
    return calls


def test_raising_conf_applies_once_per_wrapper(spark, counting_apply):
    proxy = _RaisingConfProxy(spark)
    catalog.load_table(proxy, SF_SMALL, "region")
    catalog.load_table(proxy, SF_SMALL, "nation")
    catalog.load_table(proxy, SF_SMALL, "region")
    assert len(counting_apply) == 1, (
        "conf-get failure must memoize Python-side: re-applying per call "
        "clobbers deliberate caller conf overrides"
    )


def test_distinct_wrappers_each_get_confs(spark, counting_apply):
    catalog.load_table(_RaisingConfProxy(spark), SF_SMALL, "region")
    catalog.load_table(_RaisingConfProxy(spark), SF_SMALL, "region")
    assert len(counting_apply) == 2


def test_marker_conf_path_applies_once(spark, counting_apply, monkeypatch):
    # healthy session: marker conf memoizes; force a fresh start by clearing
    # BOTH memos (the fallback WeakSet is consulted on the happy path too —
    # round-8 advice), then two loads must apply exactly once
    spark.conf.unset(catalog._CONFS_MARKER)
    catalog._CONFS_APPLIED_FALLBACK.discard(spark)
    catalog.load_table(spark, SF_SMALL, "region")
    catalog.load_table(spark, SF_SMALL, "nation")
    assert len(counting_apply) == 1
    assert spark.conf.get(catalog._CONFS_MARKER) == "1"


class _SetFailsConfProxy:
    """conf.get WORKS (returns the real value) but conf.set fails — the
    round-8 advice hole: the marker can never be written, so without the
    happy-path fallback consult every load_table re-applies RUNTIME_CONFS."""

    def __init__(self, inner):
        self._inner = inner

        class _Conf:
            def get(_self, *a, **k):
                return inner.conf.get(*a, **k)

            def set(_self, *a, **k):
                raise RuntimeError("conf set rejected")

        self.conf = _Conf()

    def __getattr__(self, name):
        return getattr(self._inner, name)


def test_get_works_set_fails_applies_once(spark, counting_apply):
    spark.conf.unset(catalog._CONFS_MARKER)
    catalog._CONFS_APPLIED_FALLBACK.discard(spark)
    proxy = _SetFailsConfProxy(spark)
    catalog.load_table(proxy, SF_SMALL, "region")
    catalog.load_table(proxy, SF_SMALL, "nation")
    catalog.load_table(proxy, SF_SMALL, "region")
    assert len(counting_apply) == 1, (
        "a working conf.get with a failing conf.set must still memoize via "
        "the fallback WeakSet, not re-apply per call"
    )
