#!/usr/bin/env python3
"""Deterministic fuzz-corpus generator for the normalizer parity oracle.

Emits JSON-lines FDR events: for each mapped event name, random subsets
of that class's payload keys with type-plausible values (numeric keys
stay numeric strings — the reference int()s some of them and would
crash a Lambda on garbage, which is its documented malformed-input
behavior, not a normalization semantic worth diffing). Unknown keys,
empty-string values, missing timestamps and odd platforms are all
mixed in to exercise the get/del branch combinatorics.

Usage: parity_fuzz.py [count] [seed] > fuzz.jsonl
The corpus is checked in (src/test/resources/fdr_parity_fuzz.jsonl) so
the spec needs no generator at test time; regenerate only to widen.
"""

import json
import random
import sys

CLASS_KEYS = {
    "Process Activity": {
        "text": ["ImageFileName", "CommandLine", "MD5HashData", "SHA256HashData",
                 "ParentBaseFileName", "ParentCommandLine", "ParentImageFileName"],
        "num": ["RawProcessId", "SourceProcessId", "ParentProcessId"],
    },
    "Network Activity": {
        "text": ["LocalAddressIP4", "RemoteAddressIP4", "LocalAddressIP6",
                 "RemoteAddressIP6", "PhysicalAddress"],
        "num": ["LocalPort", "RemotePort"],
        "enum": {"ConnectionDirection": ["0", "1", "2", "3", "9", ""]},
    },
    "HTTP Activity": {
        "text": ["HttpHost", "HttpPath", "Ja3Hash", "TlsVersion", "DomainName",
                 "ImageFileName", "CommandLine", "RemoteAddressIP4", "RemoteAddressIP6"],
        "num": ["LocalPort", "RemotePort", "HttpStatus"],
        "enum": {"HttpMethod": ["1", "2", "3", "4", "5", "6", "7", "8", "9", ""]},
    },
    "File System Activity": {
        "text": ["TargetFileName", "TargetDirectoryName", "ScriptContentName",
                 "FileIdentifier", "UserName", "SHA256HashData", "ContentSHA256HashData"],
        "num": [],
    },
    "Module Activity": {
        "text": ["BundleID", "IOServicePath", "ImageFileName", "MD5HashData",
                 "SHA1HashData", "SHA256HashData"],
        "num": [],
    },
    "DNS Activity": {
        "text": ["DomainName", "ContextBaseFileName"],
        "num": [],
    },
    "Authentication": {
        "text": ["UserName", "UserPrincipal", "UserSid", "AuthenticationId",
                 "AuthenticationUuid", "AuthenticationIdMac"],
        "num": ["RawProcessId"],
        "enum": {"LogonType": ["2", "3", "4", "5", "7", "8", "9", "10", "11",
                               "12", "13", "99", ""],
                 "UserIsAdmin": ["0", "1", ""]},
    },
    "Application Lifecycle": {
        "text": ["AppName", "AppSource", "AppVendor", "AppVersion"],
        "num": [],
        "enum": {"UpdateFlag": ["0", "1", "2", "3", "4", "5", "7", ""]},
    },
    "Operating System Patch State": {
        "text": [],
        "num": [],
        "enum": {"Status": ["0", "1", "2", "5", ""],
                 "InstalledUpdateIds": ["KB1", "KB1;KB2", "KB1;KB2;KB3", ""]},
    },
    "File Hosting Activity": {
        "text": ["SourceFileName", "DownloadPath", "DownloadServer",
                 "SHA256HashData", "ContentSHA256HashData"],
        "num": ["DownloadPort"],
    },
    "Detection Finding": {
        "text": ["ImageFileName", "CommandLine", "ContentSHA256HashData",
                 "ParentImageFileName", "GrandparentImageFileName",
                 "GrandparentCommandLine"],
        "num": ["ContextProcessId"],
    },
    "Device Config State": {
        "text": ["TamperType", "ConfigStateData", "SystemTags", "InterfaceAlias"],
        "num": [],
    },
}

PLATFORMS = ["Win", "Lin", "Mac", "iOS", "Android", "", None]
WORDS = ["alpha", "beta", "gamma/delta", "C:\\Users\\x y\\file.exe",
         "/usr/local/bin/tool", "søme-ünicode", "a b c", "trailing ",
         "", "0", "null", "with\"quote", "semi;colon"]


def main():
    count = int(sys.argv[1]) if len(sys.argv) > 1 else 260
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    rnd = random.Random(seed)

    with open("/root/reference/src/json/mapped_qfdr_events_to_class.json") as f:
        mapping = json.load(f)
    events_by_class = {c["ClassName"]: c["MappedFdrEvents"] for c in mapping}

    classes = [c for c in CLASS_KEYS if c in events_by_class]
    for i in range(count):
        cls = classes[i % len(classes)]
        spec = CLASS_KEYS[cls]
        names = [e for e in events_by_class[cls] if e != "Event_ExternalApiEvent"]
        ev = rnd.choice(names)
        line = {"event_simpleName": ev, "id": f"fuzz-{i}"}
        if rnd.random() < 0.9:
            line["name"] = f"{ev}V{rnd.randint(1, 20)}"
        if rnd.random() < 0.9:
            line["aid"] = f"aid-{rnd.randint(0, 99)}"
        if rnd.random() < 0.9:
            line["cid"] = f"cid-{rnd.randint(0, 99)}"
        if rnd.random() < 0.5:
            line["aip"] = f"{rnd.randint(1, 255)}.0.0.{rnd.randint(1, 255)}"
        if rnd.random() < 0.85:  # else: the 1998 sentinel path
            ts = rnd.choice([1700000000 + rnd.randint(0, 10**6),
                             (1700000000 + rnd.randint(0, 10**6)) * 1000])
            line["timestamp"] = str(ts)
        platform = rnd.choice(PLATFORMS)
        if platform is not None:
            line["event_platform"] = platform
        if rnd.random() < 0.4:
            line["ConfigBuild"] = f"1007.{rnd.randint(0, 9)}"

        for k in spec.get("text", []):
            if rnd.random() < 0.5:
                line[k] = rnd.choice(WORDS)
        for k in spec.get("num", []):
            if rnd.random() < 0.5:
                line[k] = str(rnd.randint(0, 70000))
        for k, choices in spec.get("enum", {}).items():
            if rnd.random() < 0.6:
                line[k] = rnd.choice(choices)
        for _ in range(rnd.randint(0, 2)):
            line[f"FuzzKey{rnd.randint(0, 9)}"] = rnd.choice(WORDS)

        print(json.dumps(line, ensure_ascii=False))


if __name__ == "__main__":
    main()
