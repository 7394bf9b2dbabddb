"""The example pipelines run end-to-end in CI (the shareprice rebuild
has its own test file): corpus_index (manifest, 2 concurrent jobs) and
similarity_search (PQ + PageRank + quantization as config steps).
Slow — each is a real multi-job drive over sf0.01."""

import importlib.util
import os
import sys

import pytest

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _load(path):
    spec = importlib.util.spec_from_file_location("example_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_similarity_search_example(spark):
    mod = _load(os.path.join(_ROOT, "examples", "similarity_search", "run.py"))
    mod.main()  # asserts internally (counts, schemas)


@pytest.mark.slow
def test_corpus_index_example(spark):
    mod = _load(os.path.join(_ROOT, "examples", "corpus_index", "run.py"))
    mod.main()  # asserts internally (pairs, clusters, sample sizes)


@pytest.mark.slow
def test_rag_prep_example(spark):
    mod = _load(os.path.join(_ROOT, "examples", "rag_prep", "run.py"))
    mod.main()  # asserts internally (chunk geometry, postings, tfidf)


@pytest.mark.slow
def test_media_pipeline_example(spark):
    mod = _load(os.path.join(_ROOT, "examples", "media_pipeline", "run.py"))
    mod.main()  # asserts internally (formats decoded, features, frame fan-out)


@pytest.mark.slow
def test_web_analytics_example(spark):
    mod = _load(os.path.join(_ROOT, "examples", "web_analytics", "run.py"))
    mod.main()  # asserts internally (URL hygiene, domain cap, funnel
    # monotonicity, bar/sketch mass conservation, linkage truth)


def test_lakehouse_example(spark):
    mod = _load(os.path.join(_ROOT, "examples", "lakehouse", "run.py"))
    mod.main()  # asserts internally (commits, time travel, exactly-once,
    # pruned merge, optimize/vacuum)


def test_medallion_example(spark):
    mod = _load(os.path.join(_ROOT, "examples", "medallion", "run.py"))
    mod.main()  # asserts internally (per-hop increments, exactly-once
    # commit counts, idempotent empty re-run)


def test_registry_docs_bench_consistency():
    """tools/consistency_check.py: registry ↔ docs ↔ bench drift guard
    (stale counts and undocumented steps were recurring advice items)."""
    import subprocess

    r = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "tools", "consistency_check.py")],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
