"""Batched device->host transfers for proof assembly.

The tunneled TPU backend has no effective async host copy: every
``np.asarray(device_array)`` is a blocking round trip (~15-25 ms).  Proof
assembly (prover step 9) drains ~20 small independent arrays - query-row
gathers, Merkle leaf/node openings for every tree, FRI layer rows - and
paying a round trip each made it the dominant small-proof phase (measured
316 ms of a 1.2 s steady 2^10 proof inside fri.build_proof alone).

``TransferBatch`` collects the device arrays and fetches them all with
CONCURRENT ``np.asarray`` calls from a thread pool, overlapping the round
trips (PJRT transfers are thread-safe).  A device-side concatenate-then-
one-fetch variant was tried first and measured SLOWER: the gather sizes
are position-dependent, so every proof produced a fresh concat shape and
paid a tunnel compile/executable-load instead of round trips.  Field
values are untouched - this is pure transfer scheduling.
"""

import numpy as np


class TransferBatch:
    """Collects device arrays; one concurrent fetch drains all of them.

    add(arr) -> ref; after fetch() (idempotent, first call drains the pool
    with overlapped round trips), get(ref) returns the host numpy array.
    """

    def __init__(self):
        self._items = []
        self._host = None

    def add(self, arr):
        assert self._host is None, "batch already fetched"
        self._items.append(arr)
        return len(self._items) - 1

    def fetch(self):
        if self._host is None:
            if len(self._items) <= 1:
                self._host = [np.asarray(a) for a in self._items]
            else:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(
                        max_workers=min(8, len(self._items))) as ex:
                    self._host = list(ex.map(np.asarray, self._items))
        return self._host

    def get(self, ref):
        return self.fetch()[ref]
