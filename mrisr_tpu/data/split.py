"""Patient-level split, bit-compatible with the reference.

The reference splits SORTED patient folder names with
``train_test_split(folders, test_size=0.3, random_state=42)`` then
``train_test_split(test_val, test_size=0.6, random_state=42)``, giving
70 / 12 / 18 % train / val / test *by patient*
(`/root/reference/src/ModelDataGenerator.py:236-247`).  sklearn is used
directly so the exact same patients land in the exact same splits.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from sklearn.model_selection import train_test_split


def patient_level_split(
    patient_ids: Sequence[str],
    test_val_fraction: float = 0.3,
    test_within_fraction: float = 0.6,
    seed: int = 42,
) -> Tuple[List[str], List[str], List[str]]:
    """Return (train, val, test) patient id lists."""
    ids = sorted(patient_ids)
    train, test_val = train_test_split(
        ids, test_size=test_val_fraction, random_state=seed
    )
    val, test = train_test_split(
        test_val, test_size=test_within_fraction, random_state=seed
    )
    return list(train), list(val), list(test)


def split_for(
    patient_ids: Sequence[str],
    split: str,
    test_val_fraction: float = 0.3,
    test_within_fraction: float = 0.6,
    seed: int = 42,
) -> List[str]:
    train, val, test = patient_level_split(
        patient_ids, test_val_fraction, test_within_fraction, seed
    )
    return {"train": train, "val": val, "test": test}[split]
