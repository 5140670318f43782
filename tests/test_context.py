"""DataContext policy helpers (fastobo_py_ray.context)."""

import os

import pytest

from fastobo_py_ray.context import allow_store_overcommit, tune_data_context


@pytest.fixture
def restore_ctx(ray_session):
    """Snapshot/restore the DataContext fields these helpers touch so
    policy tests don't leak into the shared session."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    saved = (ctx.override_object_store_memory_limit_fraction,
             ctx.op_resource_reservation_enabled)
    yield ctx
    (ctx.override_object_store_memory_limit_fraction,
     ctx.op_resource_reservation_enabled) = saved


def test_allow_store_overcommit_sets_logical_fraction(restore_ctx):
    """The spill-rehearsal fix: the logical object-store budget is
    detected-plasma x override fraction (resource_manager.py
    get_global_limits), so a >1 override is how a blocking all-to-all
    keeps admitting producers on a store smaller than its working set
    (measured: 2.8x wall vs a >20x collapse — BASELINE round-5 spill
    rehearsal)."""
    ctx = allow_store_overcommit(12)
    assert ctx is restore_ctx
    assert ctx.override_object_store_memory_limit_fraction == 12.0


def test_tune_data_context_reads_overcommit_env(restore_ctx, monkeypatch):
    monkeypatch.setenv("FASTOBO_RAY_STORE_OVERCOMMIT", "6.5")
    ctx = tune_data_context()
    assert ctx.override_object_store_memory_limit_fraction == 6.5


def test_tune_data_context_default_leaves_fraction_alone(restore_ctx,
                                                         monkeypatch):
    monkeypatch.delenv("FASTOBO_RAY_STORE_OVERCOMMIT", raising=False)
    restore_ctx.override_object_store_memory_limit_fraction = None
    ctx = tune_data_context()
    assert ctx.override_object_store_memory_limit_fraction is None
    assert ctx.op_resource_reservation_enabled is False


def test_tune_data_context_overcommit_zero_means_disabled(restore_ctx,
                                                          monkeypatch):
    """FASTOBO_RAY_STORE_OVERCOMMIT=0 is the conventional OFF value —
    it must leave the fraction alone, not set a zero logical budget
    that backpressures every operator to a standstill."""
    monkeypatch.setenv("FASTOBO_RAY_STORE_OVERCOMMIT", "0")
    restore_ctx.override_object_store_memory_limit_fraction = None
    ctx = tune_data_context()
    assert ctx.override_object_store_memory_limit_fraction is None
