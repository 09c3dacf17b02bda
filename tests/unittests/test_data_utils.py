"""data_utils helpers (≈ avex/data/data_utils.py:14-96)."""

import numpy as np

from avex_tpu.data.data_utils import balance_by_attribute, combine_text_labels


def test_balance_by_attribute_downsamples_majority():
    items = [{"label": "a"}] * 10 + [{"label": "b"}] * 3 + [{"label": "c"}] * 5
    keep = balance_by_attribute(items, max_per_value=3, seed=0)
    labels = [items[i]["label"] for i in keep]
    assert labels.count("a") == 3 and labels.count("b") == 3 and labels.count("c") == 3
    assert keep == sorted(keep)
    # default cap = minority class size
    keep_default = balance_by_attribute(items)
    labels = [items[i]["label"] for i in keep_default]
    assert max(labels.count(v) for v in "abc") == 3
    # deterministic under the same seed
    assert balance_by_attribute(items, max_per_value=3, seed=7) == balance_by_attribute(
        items, max_per_value=3, seed=7
    )


def test_combine_text_labels_joins_in_place():
    items = [
        {"common_name": "Great Tit", "sci_name": "Parus major"},
        {"common_name": "", "sci_name": "Corvus corax"},
    ]
    combine_text_labels(items, ["common_name", "sci_name"])
    assert items[0]["text_label"] == "Great Tit, Parus major"
    assert items[1]["text_label"] == "Corvus corax"
