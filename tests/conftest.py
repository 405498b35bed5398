"""Shared pytest fixtures: one session-scoped local SparkSession."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from document_automation_spark.session import build_session

    session = build_session(app_name="pytest", master="local[4]", shuffle_partitions=4)
    yield session
    session.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
