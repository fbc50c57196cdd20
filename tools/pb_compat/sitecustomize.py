"""Gated protobuf gencode/runtime version-check relaxation.

The sandbox has no installed ``google.protobuf``, but the (public)
google-cloud-sdk appengine platform dir ships a pure-Python protobuf
runtime one minor version older than PySpark's generated
StateMessage_pb2 gencode.  With ``GMR_TWS_PB_SHIM=1`` this module —
imported automatically by ``site`` in every interpreter that has it on
PYTHONPATH, including Spark's streaming python workers — no-ops the
strict gencode>=runtime check so transformWithState can be verified
end-to-end.  Without the flag it does nothing.
"""

import os

if os.environ.get("GMR_TWS_PB_SHIM") == "1":
    try:
        from google.protobuf import runtime_version as _rv

        _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    except Exception:
        pass
