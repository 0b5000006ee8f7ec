"""Golden parity: the engine reproduces every row of the reference's
committed evaluation table (result_printouts/results_tool_evaluation.txt)
from the reference's own data files — exact to the 4 decimals the
reference prints. This is the 'matches the reference's results on its own
test queries' gate."""

from __future__ import annotations

import pytest

from cer_for_mti_spark.operators import reference_parity as rp

pytestmark = pytest.mark.skipif(
    not rp.reference_available(), reason="/root/reference not present"
)


@pytest.fixture(scope="module")
def expected():
    exp = rp.parse_golden_file()
    # golden file labels the gold self-eval row plainly "Nested"
    assert "Nested" in exp and exp["Nested"] == (1.0, 1.0, 1.0)
    return exp


@pytest.mark.parametrize("tool", rp.GOLDEN_TOOLS)
def test_golden_row(spark, tool, expected):
    got = rp.evaluate_tool(spark, tool)
    assert got == expected[tool], (
        f"{tool}: engine {got} != golden {expected[tool]}"
    )
