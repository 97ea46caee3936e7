"""The repair stage's verdict network: real tensor math, exact decisions."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from manga_translator_spark.functions import verdict_model as vm


def test_committed_weights_match_closed_form():
    """The .npz on disk is exactly the closed-form decision-equivalent
    weights — regenerating is a no-op unless the rule constants change."""
    net = vm.PatchVerdictNet()
    built = vm.build_weights()
    assert np.array_equal(net.weights, built["weights"])
    assert np.array_equal(net.bias, built["bias"])
    assert net.features == list(vm.FEATURE_NAMES)


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
    ),
    st.sampled_from(["", ".", "!", "?", ",", " .", "x"]),
)
def test_net_decision_equals_rule(body, tail):
    """argmax over the committed weights == the documented keep rule, for
    any text (the module docstring's margin proof, property-tested)."""
    t = body + tail
    net = vm.get_verdict_model()
    assert bool(net.infer([t])[0]) == vm.rule_keep(t)


def test_boundary_lengths_exact():
    net = vm.PatchVerdictNet()
    for n in (vm.MIN_KEEP_LEN - 1, vm.MIN_KEEP_LEN, vm.LEN_CLIP, vm.LEN_CLIP + 50):
        t = "a" * (n - 1) + "."
        assert bool(net.infer([t])[0]) == (n >= vm.MIN_KEEP_LEN)
        assert not net.infer(["a" * n])[0]  # no sentence end -> never keep


def test_one_matmul_per_batch():
    net = vm.PatchVerdictNet()
    assert net.matmul_calls == 0
    net.infer(["short", "a" * 80 + ".", "mid length but no stop"])
    assert net.matmul_calls == 1
    net.infer([])  # empty batch short-circuits, no matmul
    assert net.matmul_calls == 1
    net.infer(["x."])
    assert net.matmul_calls == 2


def test_per_worker_singleton_loads_once():
    vm._MODEL = None
    vm.LOAD_COUNT = 0
    a = vm.get_verdict_model()
    b = vm.get_verdict_model()
    assert a is b and vm.LOAD_COUNT == 1
