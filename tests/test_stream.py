"""PrefetchLoader: ordering, lookahead, shutdown."""

import time

from iprgan_tpu.data.stream import PrefetchLoader


def test_prefetch_loader_order_and_overlap():
    calls = []

    def produce(n):
        calls.append(n)
        time.sleep(0.01)
        return ("chunk", n)

    loader = PrefetchLoader(produce)
    loader.request(3)
    loader.request(5)  # queued while first may still be producing
    assert loader.get() == ("chunk", 3)
    assert loader.get() == ("chunk", 5)
    assert calls == [3, 5]
    loader.close()


def test_prefetch_loader_speculative_drain():
    """The experiments' _fetch pattern: stale speculative chunks are
    drained when the requested size changes."""
    loader = PrefetchLoader(lambda n: n * 10)
    loader.request(2)
    assert loader.get() == 20
    loader.request(2)      # speculative
    # next caller wants 4: drain the stale 2-chunk, then produce 4
    assert loader.get() == 20
    loader.request(4)
    assert loader.get() == 40
    loader.close()
