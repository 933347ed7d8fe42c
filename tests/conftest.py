"""Shared test session + lazily-materialized fixtures (FIXTURES.md)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from openie_spark.fixtures import store
from openie_spark.fixtures.entities import alias_rows
from openie_spark.fixtures.gen_docs import docs_interleaved
from openie_spark.fixtures.gen_golden import golden_docs
from openie_spark.session import get_spark

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="openie-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def golden_docs_path() -> str:
    return store.ensure("golden_docs", lambda p: store.write_docs(golden_docs(), p))


@pytest.fixture(scope="session")
def golden_docs_list() -> list[dict]:
    return golden_docs()


@pytest.fixture(scope="session")
def docs_sf0001_path() -> str:
    return store.ensure(
        "docs_interleaved_sf0.001", lambda p: store.write_docs(docs_interleaved(SF0001), p)
    )


from openie_spark.fixtures.entities import ALIAS_PA, ensure_alias_dict  # noqa: E402


@pytest.fixture(scope="session")
def alias_dict_path() -> str:
    return ensure_alias_dict()
