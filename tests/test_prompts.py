import sys

import pytest

from navillm_tpu.agents import prompts as P


def _ref_agent(name):
    sys.path.insert(0, "/root/reference")
    try:
        from tasks.agents.r2r import R2RAgent
        from tasks.agents.cvdn import CVDNAgent
        from tasks.agents.reverie import REVERIEAgent
        from tasks.agents.soon import SOONAgent
        from tasks.agents.eqa import EQAAgent
        from tasks.agents.scanqa import ScanQAAgent
        cls = {"r2r": R2RAgent, "cvdn": CVDNAgent, "reverie": REVERIEAgent,
               "soon": SOONAgent, "eqa": EQAAgent, "scanqa": ScanQAAgent}[name]
        return cls.__new__(cls)
    finally:
        sys.path.remove("/root/reference")


try:
    _ref_agent("r2r")
    ref_ok = True
except Exception:
    ref_ok = False

needs_ref = pytest.mark.skipif(not ref_ok, reason="reference not importable")

INSTR = "go to the kitchen and stop"
CLS = "<cls_1>"


@needs_ref
@pytest.mark.parametrize("task", ["r2r", "cvdn", "reverie", "soon"])
def test_navigation_prompt_golden(task):
    ref = _ref_agent(task).get_navigation_prompt(INSTR, 3, 5, CLS)
    assert P.navigation_prompt(task, INSTR, 3, 5, CLS) == ref


@needs_ref
def test_eqa_navigation_prompt_golden():
    ref = _ref_agent("eqa").get_navigation_prompt("what color is it?", 2, 4, CLS)
    assert P.navigation_prompt("eqa", "what color is it?", 2, 4, CLS) == ref


@needs_ref
@pytest.mark.parametrize("task", ["r2r", "reverie", "soon"])
@pytest.mark.parametrize("cand_num", [0, 4])
def test_summarization_prompt_golden(task, cand_num):
    ref = _ref_agent(task).get_summarization_prompt(INSTR, 2, cand_num)
    assert P.summarization_prompt(task, INSTR, 2, cand_num) == ref


@needs_ref
@pytest.mark.parametrize("hist_num", [0, 3])
def test_embodied_qa_prompt_golden_r2r(hist_num):
    ref = _ref_agent("r2r").get_embodied_qa_prompt(INSTR, hist_num, 4)
    assert P.embodied_qa_prompt("r2r", INSTR, hist_num, 4) == ref


@needs_ref
def test_embodied_qa_prompt_golden_eqa():
    ref = _ref_agent("eqa").get_embodied_qa_prompt(INSTR, 2, 4)
    assert P.embodied_qa_prompt("eqa", INSTR, 2, 4) == ref


@needs_ref
@pytest.mark.parametrize("task", ["reverie", "soon"])
def test_object_grounding_prompt_golden(task):
    ref = _ref_agent(task).get_object_grounding_prompt(INSTR, 1, 6, CLS)
    assert P.object_grounding_prompt(task, INSTR, 1, 6, CLS) == ref


@needs_ref
def test_3dqa_prompt_golden():
    ref = _ref_agent("scanqa").get_3dqa_prompt("how many chairs?", 8)
    assert P.threedqa_prompt("how many chairs?", 8) == ref
