"""Data layer: ingest, packed volume store, index math, device feeding.

Reference components covered (SURVEY.md §2.1): D1 zip extractor (extract.py),
D2 cleaner (clean.py), D3/D4 series discovery (discovery.py), D5/D6 triplet
generation + indexing (triplets.py), D7 paired augmentation
(ops/augment.py, device-side), D8 patient-level split (split.py),
D10 progressive 5-slice windows (triplets.py), synthetic fixture
(synthetic.py, the analog of ``create_dummy_dataset`` at
`/root/reference/src/unet_model.py:301-310`).
"""

from mrisr_tpu.data.triplets import (  # noqa: F401
    TripletIndex,
    WindowIndex,
    triplet_slice_ids,
    num_triplets,
)
from mrisr_tpu.data.synthetic import (  # noqa: F401
    make_synthetic_volume,
    make_synthetic_store,
)
