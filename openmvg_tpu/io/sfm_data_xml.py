"""sfm_data.xml — the cereal XMLOutputArchive flavor of the scene format.

Reference parity: sfm/sfm_data_io.cpp:71-116 dispatches .xml to the same
cereal NVP serialization as .json (sfm_data_io_cereal.cpp); cereal's XML
archive lays the identical name/value tree out as XML: a <cereal> root,
one element per NVP, dynamic containers carrying a size="dynamic"
attribute with <value0>, <value1>, ... children.

Implementation: the shared scene<->doc mapping from io/sfm_data.py plus a
generic doc<->ElementTree transcoder, so json/xml/bin stay structurally
identical.  (The reference snapshot vendors no cereal headers and ships no
golden .xml, so — like .bin — this is validated by round-trip and by
structural match with the verified JSON layout.)
"""

import xml.etree.ElementTree as ET

from openmvg_tpu.io.sfm_data import ALL, _doc_from_scene, _scene_from_doc


def _to_elem(tag, value):
    e = ET.Element(tag)
    if isinstance(value, dict):
        for k, v in value.items():
            e.append(_to_elem(k, v))
    elif isinstance(value, (list, tuple)):
        e.set("size", "dynamic")
        for i, v in enumerate(value):
            e.append(_to_elem(f"value{i}", v))
    elif isinstance(value, bool):
        e.text = "true" if value else "false"
    else:
        e.text = str(value)
    return e


_STRING_FIELDS = {"filename", "local_path", "root_path", "polymorphic_name",
                  "sfm_data_version"}


def _from_elem(e):
    kids = list(e)
    if e.get("size") == "dynamic" or (
            kids and all(k.tag.startswith("value") for k in kids)
            and len(kids) > 0 and kids[0].tag == "value0"):
        return [_from_elem(k) for k in kids]
    if kids:
        return {k.tag: _from_elem(k) for k in kids}
    t = (e.text or "").strip()
    if e.tag in _STRING_FIELDS:
        return t
    if t == "true":
        return True
    if t == "false":
        return False
    try:
        return int(t)
    except ValueError:
        pass
    try:
        return float(t)
    except ValueError:
        return t


def save_sfm_data_xml(scene, path, parts: int = ALL):
    doc = _doc_from_scene(scene, parts)
    root = ET.Element("cereal")
    for k, v in doc.items():
        root.append(_to_elem(k, v))
    ET.indent(root)
    with open(path, "wb") as f:
        f.write(b'<?xml version="1.0" encoding="utf-8"?>\n')
        f.write(ET.tostring(root))
    return True


def load_sfm_data_xml(path, parts: int = ALL):
    root = ET.parse(path).getroot()
    doc = {k.tag: _from_elem(k) for k in root}
    # empty container elements parse as "" — normalize to []
    for key in ("views", "intrinsics", "extrinsics", "structure",
                "control_points"):
        if not isinstance(doc.get(key), list):
            doc[key] = []
    return _scene_from_doc(doc, parts)
