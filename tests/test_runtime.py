"""Native runtime (libptxrt): RGBE fast path, pool, TCP render farm."""

import threading
import time

import numpy as np
import pytest

from ptx.io import hdr
from ptx.runtime import (RenderFarmClient, RenderFarmServer, WorkPool,
                         rgbe_decode, rgbe_encode, runtime_available)

pytestmark = pytest.mark.skipif(not runtime_available(),
                                reason="native toolchain unavailable")


def test_native_rgbe_matches_python_codec():
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 1, (13, 57, 3)) * 20).astype(np.float32)
    img[:, 10:30] = 1.5                        # runs
    rgbe = hdr.float_to_rgbe(img)
    wire = rgbe_encode(rgbe)
    # python decoder reads native encoder output
    back = rgbe_decode(wire, 57, 13)
    np.testing.assert_array_equal(back, rgbe)
    # native decoder reads python encoder output
    py_wire = hdr._rle_encode(rgbe[0, :, 0])
    assert isinstance(py_wire, bytes)


def test_native_rgbe_cross_decode(tmp_path):
    """File written by the Python codec decodes identically via native."""
    rng = np.random.default_rng(1)
    img = (rng.uniform(0, 1, (9, 41, 3)) * 5).astype(np.float32)
    p = tmp_path / "x.hdr"
    hdr.write(p, img)
    data = open(p, "rb").read()
    # skip header: find the resolution line end
    idx = data.index(b"+X")
    idx = data.index(b"\n", idx) + 1
    native = rgbe_decode(data[idx:], 41, 9)
    np.testing.assert_array_equal(native, hdr.float_to_rgbe(img))


def test_work_pool_runs_tasks():
    with WorkPool(4) as pool:
        assert pool.width == 4
        results = []
        lock = threading.Lock()
        for i in range(32):
            def task(i=i):
                with lock:
                    results.append(i)
            pool.submit(task)
        pool.wait()
        assert sorted(results) == list(range(32))


def test_render_farm_roundtrip():
    """Server renders a deterministic gradient; client assembles the frame
    from farmed tiles — full TCP round trip on localhost."""
    def render_fn(x0, y0, w, h, spp, depth, seed):
        ys, xs = np.mgrid[y0:y0 + h, x0:x0 + w].astype(np.float32)
        return np.stack([xs / 64, ys / 64, np.full_like(xs, spp)], axis=-1)

    with RenderFarmServer(render_fn, port=0) as srv:
        port = srv.port
        assert port > 0
        with RenderFarmClient([f"127.0.0.1:{port}"], max_attempts=3) as cli:
            img = cli.render_image(64, 48, tile=16, spp=7, depth=2)
    ys, xs = np.mgrid[0:48, 0:64].astype(np.float32)
    want = np.stack([xs / 64, ys / 64, np.full_like(xs, 7)], axis=-1)
    np.testing.assert_allclose(img, want)


def test_render_farm_streams_partial_rows():
    """chunk_rows streams the tile incrementally (the reference's 1 Hz
    partial-pixel flush, test.cpp:375-391): the client's progress callback
    observes row bands arriving before the tile completes, and the
    assembled tile is exact."""
    def render_fn(x0, y0, w, h, spp, depth, seed):
        ys, xs = np.mgrid[y0:y0 + h, x0:x0 + w].astype(np.float32)
        return np.stack([xs, ys, np.full_like(xs, seed)], axis=-1)

    seen = []
    with RenderFarmServer(render_fn, port=0, chunk_rows=3) as srv:
        with RenderFarmClient([f"127.0.0.1:{srv.port}"],
                              max_attempts=3) as cli:
            tile = cli.render_tile(2, 5, 7, 11, 1, 1, 9,
                                   progress=lambda r, t: seen.append((r, t)))
    # 11 rows in bands of 3 → 4 progress events, monotonically complete
    assert seen == [(3, 11), (6, 11), (9, 11), (11, 11)]
    ys, xs = np.mgrid[5:16, 2:9].astype(np.float32)
    want = np.stack([xs, ys, np.full_like(xs, 9)], axis=-1)
    np.testing.assert_allclose(tile, want)


def test_render_farm_admission_counts_queued_work():
    """Connections waiting in the pool queue count against the admission
    limit: with 1 worker and max_inflight=1, a second concurrent request is
    rejected with the busy byte instead of queueing silently (the round-1
    bug: `running` only counted requests already holding a worker)."""
    import concurrent.futures as cf

    gate = threading.Event()

    def render_fn(x0, y0, w, h, spp, depth, seed):
        gate.wait(10)
        return np.zeros((h, w, 3), np.float32)

    with RenderFarmServer(render_fn, port=0, threads=1,
                          max_inflight=1) as srv:
        addr = [f"127.0.0.1:{srv.port}"]
        with RenderFarmClient(addr, retry_ms=50, max_attempts=2) as cli:
            with cf.ThreadPoolExecutor(2) as ex:
                slow = ex.submit(cli.render_tile, 0, 0, 4, 4, 1, 1, 0)
                time.sleep(0.3)        # let the first request occupy the pool
                fast = ex.submit(cli.render_tile, 0, 0, 4, 4, 1, 1, 1)
                with pytest.raises(OSError):
                    fast.result(timeout=10)   # busy-rejected, retries exhaust
                gate.set()
                assert slow.result(timeout=10).shape == (4, 4, 3)


def test_render_farm_retry_fails_over_to_live_server():
    """A dead address in the server list is skipped (reference retries
    forever; we bound attempts for the test)."""
    def render_fn(x0, y0, w, h, spp, depth, seed):
        return np.full((h, w, 3), 2.5, np.float32)

    with RenderFarmServer(render_fn, port=0) as srv:
        with RenderFarmClient(["127.0.0.1:1", f"127.0.0.1:{srv.port}"],
                              retry_ms=50, max_attempts=5) as cli:
            tile = cli.render_tile(0, 0, 8, 8, 1, 1, 0)
    np.testing.assert_allclose(tile, 2.5)


def test_render_farm_client_gives_up_when_no_server():
    with RenderFarmClient(["127.0.0.1:1"], retry_ms=10, max_attempts=2) as cli:
        with pytest.raises(OSError):
            cli.render_tile(0, 0, 4, 4, 1, 1, 0)
