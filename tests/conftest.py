from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from document_ai_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """Deterministic 200-doc corpus + goldens, generated once per session."""
    from document_ai_spark.datagen import write_corpus

    out = str(tmp_path_factory.mktemp("corpus"))
    stats = write_corpus(out, n_docs=200, seed=42)
    assert stats["n_goldens_checked"] > 0
    return out
