"""Multihost utility tests (single-process semantics; the multi-process
paths are exercised on real pods via parallel.initialize_distributed)."""

import jax
import pytest

from ncf_tpu.parallel import (
    initialize_distributed,
    is_primary,
    local_batch_slice,
    make_mesh,
    mesh_shape_for_hosts,
    pad_rows,
    sync_hosts,
)


class TestMultihost:
    def test_initialize_noop_single_process(self):
        pid, n = initialize_distributed()
        assert pid == 0 and n == 1

    def test_is_primary(self):
        assert is_primary()

    def test_sync_hosts_noop(self):
        sync_hosts()  # must not raise single-process

    def test_local_batch_slice(self):
        start, size = local_batch_slice(1024)
        assert (start, size) == (0, 1024)
        # single-process: any batch divides 1 — exercise the modulo path
        assert local_batch_slice(7) == (0, 7)

    def test_mesh_shape_for_hosts(self):
        hosts, per_host = mesh_shape_for_hosts()
        assert hosts == 1
        assert per_host == jax.device_count()

    def test_pad_rows(self):
        assert pad_rows(10, 8) == 16
        assert pad_rows(16, 8) == 16
        assert pad_rows(1, 8) == 8


class TestMeshValidation:
    def test_too_many_devices_raises(self):
        with pytest.raises(ValueError):
            make_mesh(dcn=2, ici=8)  # 16 > 8 available
