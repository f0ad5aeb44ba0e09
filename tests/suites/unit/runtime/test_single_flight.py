"""Per-owner unit coverage: keyed single-flight locks."""

import threading
import time

from ser_tpu._internal.runtime.single_flight import SingleFlightRegistry


class TestSingleFlight:
    def test_same_key_serializes(self):
        registry = SingleFlightRegistry()
        order: list[str] = []
        started = threading.Event()

        def holder():
            with registry.acquire("accurate", "large-v3"):
                started.set()
                time.sleep(0.05)
                order.append("holder")

        def waiter():
            started.wait(timeout=5)
            with registry.acquire("accurate", "large-v3"):
                order.append("waiter")

        threads = [threading.Thread(target=holder), threading.Thread(target=waiter)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
        assert order == ["holder", "waiter"]

    def test_distinct_keys_do_not_block(self):
        registry = SingleFlightRegistry()
        release = threading.Event()
        other_ran = threading.Event()

        def holder():
            with registry.acquire("accurate", "large-v3"):
                release.wait(timeout=5)

        def other():
            with registry.acquire("medium", "xlsr"):
                other_ran.set()

        t1 = threading.Thread(target=holder)
        t2 = threading.Thread(target=other)
        t1.start()
        t2.start()
        assert other_ran.wait(timeout=5)  # not blocked by the held accurate key
        release.set()
        t1.join(timeout=5)
        t2.join(timeout=5)

    def test_registry_prunes_released_keys(self):
        registry = SingleFlightRegistry()
        with registry.acquire("a", "b"):
            assert registry.active_keys() == [("a", "b")]
        assert registry.active_keys() == []

    def test_reentrant_same_thread(self):
        registry = SingleFlightRegistry()
        with registry.acquire("k"):
            with registry.acquire("k"):  # documented re-entrant contract
                assert registry.active_keys() == [("k",)]
        assert registry.active_keys() == []

    def test_key_survives_until_last_holder_releases(self):
        registry = SingleFlightRegistry()
        inner_done = threading.Event()
        outer_acquired = threading.Event()

        def outer():
            with registry.acquire("shared"):
                outer_acquired.set()
                inner_done.wait(timeout=5)

        thread = threading.Thread(target=outer)
        thread.start()
        outer_acquired.wait(timeout=5)
        # A queued second holder keeps the key alive even as the count churns.
        assert ("shared",) in registry.active_keys()
        inner_done.set()
        thread.join(timeout=5)
        assert registry.active_keys() == []
