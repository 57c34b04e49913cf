#!/usr/bin/env python3
"""Differential normalizer oracle.

Runs the REFERENCE FDR->OCSF loader (qopcfdr_stream_loader.py, with its
AWS surface stubbed out) over the same fixture lines the Spark pipeline
normalized, and diffs the two outputs field by field for all 13 routes.

The reference module's only AWS touchpoints are at import time
(boto3 clients, sts.get_caller_identity, two s3.get_object calls for the
mapping JSONs) and sendToSqs at emit time; everything in between is pure
dict->dict. We inject stub modules via sys.modules, serve the mapping
JSONs from the reference checkout, and capture sendToSqs payloads.

Declared (allowlisted) divergences, mirrored from Normalizers.scala's
scaladoc:
  D1 `time`: Spark emits a native timestamp (ISO-8601, UTC); the
     reference emits a local-time "YYYY-mm-dd HH:MM:SS.mmm" string.
     Both are canonicalized to epoch millis (TZ pinned to UTC).
  D2 observable/hash `value`: Spark casts to string (parquet arrays
     cannot mix types); the reference mixes ints and strings.
     Canonicalized via str().
  D3 `unmapped` falsy keys: Spark consumes a payload key whenever it is
     present; the reference leaves falsy-valued keys ("" etc.) in
     `unmapped` because its `if payload.get(k):` guards skip the del.
     Falsy entries are dropped from both sides before comparing.
  D4 null-vs-absent: Spark's toJSON omits null fields; the reference
     emits explicit None. Both stripped recursively (a struct of nulls
     equals an absent struct — Firehose/Glue treat them identically).
  D5 typed numerics: Spark types `pid` & co natively (int/long); the
     reference passes raw payload strings through. Equal when the
     digits match and exactly one side is a string.
  D6 reference crashes: some inputs raise inside the reference (e.g.
     py:778 dels ParentBaseFileName after falling back to
     ParentImageFileName — KeyError when only the fallback is present),
     killing its Lambda; Spark normalizes them instead of losing them
     to the DLQ. Such lines are excluded from the diff and reported as
     ref_crashes.

Exit code 0 = zero undeclared divergences; 1 otherwise.

Usage: normalizer_diff.py <fixtures.jsonl> <spark_dump_dir> [--ref <loader.py>]
"""

import importlib.util
import json
import os
import re
import sys
import time as _time
import types
from datetime import datetime, timezone

REF_DEFAULT = "/root/reference/src/python/qopcfdr_stream_loader.py"


def load_reference_module(ref_path):
    """Import the reference loader with its AWS surface stubbed."""
    os.environ["TZ"] = "UTC"
    _time.tzset()
    os.environ.setdefault("QOPCFDR_MAPPING_BUCKET", "stub-bucket")
    os.environ.setdefault("AWS_DEFAULT_REGION", "stub-region-1")

    json_dir = os.path.join(os.path.dirname(ref_path), "..", "json")

    class _Body:
        def __init__(self, data):
            self._d = data

        def read(self):
            return self._d

    def _get_object(Bucket=None, Key=None):
        with open(os.path.join(json_dir, Key), "rb") as f:
            return {"Body": _Body(f.read())}

    s3_stub = types.SimpleNamespace(get_object=_get_object)
    sqs_stub = types.SimpleNamespace(send_message=lambda **kw: None)
    sts_stub = types.SimpleNamespace(
        get_caller_identity=lambda: {"Account": "000000000000"})

    boto3_stub = types.ModuleType("boto3")
    boto3_stub.client = lambda name, config=None: {
        "s3": s3_stub, "sqs": sqs_stub, "sts": sts_stub}[name]

    botocore_stub = types.ModuleType("botocore")
    bc_config = types.ModuleType("botocore.config")

    class Config:  # noqa: D401 - stub
        def __init__(self, **kw):
            pass

    bc_config.Config = Config
    bc_exceptions = types.ModuleType("botocore.exceptions")

    class ClientError(Exception):
        pass

    bc_exceptions.ClientError = ClientError

    sys.modules["boto3"] = boto3_stub
    sys.modules["botocore"] = botocore_stub
    sys.modules["botocore.config"] = bc_config
    sys.modules["botocore.exceptions"] = bc_exceptions

    spec = importlib.util.spec_from_file_location("qopcfdr_stream_loader", ref_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run_reference(mod, lines):
    """Feed fixture lines through the reference mapper, capturing the
    dicts it would send to SQS as (table_name, payload). Returns
    (events, crashed_ids): lines the reference raises on (D6) are
    collected separately — its Lambda would die and the batch retry
    to the DLQ."""
    captured = []

    def capture(className=None, payload=None):
        captured.append((className, payload))

    mod.sendToSqs = capture
    mapped = {x["EventName"] for x in mod.QFDR_OCSF_NORMALIZATION}
    crashed = set()
    for line in lines:
        obj = json.loads(line)
        ev = obj.get("event_simpleName", obj.get("event_type", obj.get("EventType")))
        if ev is None or ev not in mapped:
            continue  # the reference logs-and-skips these
        try:
            mod.ocsfQfdrMapper(eventName=ev, payload=dict(obj))
        except Exception:
            crashed.add(obj.get("id"))
    return [(table_name(c), p) for c, p in captured], crashed


def table_name(class_name):
    return class_name.lower().replace(" ", "_")


TS_MS = re.compile(r"^(\d{4})-(\d{2})-(\d{2})[T ](\d{2}):(\d{2}):(\d{2})(\.\d+)?")


def ts_to_millis(s):
    m = TS_MS.match(str(s))
    if not m:
        return None
    y, mo, d, h, mi, sec = (int(m.group(i)) for i in range(1, 7))
    frac = m.group(7)
    ms = int(round(float(frac) * 1000)) if frac else 0
    dt = datetime(y, mo, d, h, mi, sec, tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000) + ms


def canon(node, path=""):
    """Canonicalize a normalized-event tree per the declared divergences."""
    if isinstance(node, dict):
        out = {}
        for k, v in node.items():
            p = f"{path}.{k}" if path else k
            if k == "unmapped" and isinstance(v, dict):
                # D3: falsy-valued unmapped entries dropped on both sides
                kept = {uk: uv for uk, uv in v.items() if uv}
                if kept:
                    out[k] = kept
                continue
            if k == "time" or k.endswith("_time"):
                ms = ts_to_millis(v)
                out[k] = ms if ms is not None else v  # D1
                continue
            c = canon(v, p)
            if c is None or c == {} or c == []:
                continue  # D4
            out[k] = c
        return out
    if isinstance(node, list):
        return [canon(x, path) for x in node if canon(x, path) not in (None, {}, [])]
    if path.endswith(".value"):
        return str(node) if node is not None else None  # D2
    return node


def diff(a, b, path=""):
    """Yield (path, ref_value, spark_value) leaf differences."""
    if isinstance(a, dict) and isinstance(b, dict):
        for k in sorted(set(a) | set(b)):
            p = f"{path}.{k}" if path else k
            if k not in a:
                yield (p, "<absent>", b[k])
            elif k not in b:
                yield (p, a[k], "<absent>")
            else:
                yield from diff(a[k], b[k], p)
    elif isinstance(a, list) and isinstance(b, list):
        if len(a) != len(b):
            yield (path + ".len", len(a), len(b))
        else:
            for i, (x, y) in enumerate(zip(a, b)):
                yield from diff(x, y, f"{path}[{i}]")
    else:
        if a != b:
            # D5: typed numerics — same digits, one side string
            if (isinstance(a, str) != isinstance(b, str)
                    and not isinstance(a, (dict, list))
                    and not isinstance(b, (dict, list))
                    and str(a) == str(b)):
                return
            yield (path, a, b)


def main():
    fixtures = sys.argv[1]
    dump_dir = sys.argv[2]
    ref_path = REF_DEFAULT
    if "--ref" in sys.argv:
        ref_path = sys.argv[sys.argv.index("--ref") + 1]

    with open(fixtures) as f:
        lines = [l for l in f.read().splitlines() if l.strip()]

    mod = load_reference_module(ref_path)
    ref_events, ref_crashes = run_reference(mod, lines)

    spark_events = {}
    for fn in os.listdir(dump_dir):
        if not fn.endswith(".jsonl"):
            continue
        table = fn[:-6]
        with open(os.path.join(dump_dir, fn)) as f:
            for line in f.read().splitlines():
                if not line.strip():
                    continue
                row = json.loads(line)
                uid = (row.get("metadata") or {}).get("uid")
                spark_events[(table, uid)] = row

    problems = []
    seen = set()
    for table, payload in ref_events:
        uid = (payload.get("metadata") or {}).get("uid")
        key = (table, uid)
        seen.add(key)
        if key not in spark_events:
            problems.append((table, uid, "<event>", "present in reference", "missing in spark"))
            continue
        ref_c = canon(payload)
        spark_c = canon(spark_events[key])
        for p, rv, sv in diff(ref_c, spark_c):
            problems.append((table, uid, p, rv, sv))
    for key in spark_events:
        if key not in seen and key[1] not in ref_crashes:  # D6
            problems.append((key[0], key[1], "<event>", "missing in reference", "present in spark"))

    print(f"[parity] reference events: {len(ref_events)}, "
          f"spark events: {len(spark_events)}, routes: "
          f"{len({t for t, _ in ref_events})}, ref_crashes: {len(ref_crashes)}")
    if problems:
        print(f"[parity] {len(problems)} UNDECLARED divergences:")
        for table, uid, p, rv, sv in problems:
            print(f"  {table}/{uid} {p}: ref={rv!r} spark={sv!r}")
        return 1
    print("[parity] PASS: zero undeclared divergences across all routes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
