"""COCO-Attributes whitelist (dataset metadata).

The reference hard-codes a hand-curated 204-entry {attribute name → bool}
dict (updown-baseline/updown/data/config_attrib_selection.py:1 and the frcnn
duplicate). Here the table ships as JSON data
(``static/attrib_selection.json``) and loads into the same module-level
``attrib_selection`` name. Insertion order is preserved — the readers rely
on ``attrib_selection.values()`` aligning with the sorted attribute ids.
"""

import json
import os

_path = os.path.join(os.path.dirname(__file__), "static", "attrib_selection.json")
with open(_path) as _f:
    attrib_selection = json.load(_f)
