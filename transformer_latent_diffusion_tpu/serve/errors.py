"""Typed serving errors shared by the frontends and the micro-batcher.

Kept in a leaf module (no jax import) so `serve.app` can catch
`QueueFull` without paying the batcher module's import cost up front.
"""


class QueueFull(RuntimeError):
    """The micro-batcher's bounded queue is at capacity (VERDICT r4 #4).

    Raised by `MicroBatcher.generate` when admitting the request would
    push the number of queued-or-in-flight images past `max_queue_imgs`.
    Both HTTP frontends translate this into a 503 with a Retry-After
    header instead of letting client latency grow without bound.
    """
