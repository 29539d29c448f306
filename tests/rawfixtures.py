"""Synthetic raw log files in the reference's DataType formats
(FIXTURES.md B1-B8). Deterministic, tiny, generated into a tmpdir."""

from __future__ import annotations

import gzip
import json
import os
import zipfile

VPCFLOW_HEADER = (
    "version account-id interface-id srcaddr dstaddr srcport dstport protocol "
    "packets bytes start end action log-status vpc-id subnet-id instance-id "
    "tcp-flags type pkt-srcaddr pkt-dstaddr region az-id sublocation-type "
    "sublocation-id pkt-src-aws-service pkt-dst-aws-service flow-direction "
    "traffic-path"
)

#: (srcaddr, dstaddr, srcport, dstport, protocol, packets, bytes, action)
VPCFLOW_ROWS = [
    ("10.0.0.1", "172.31.23.171", 443, 53211, 6, 10, 8400, "ACCEPT"),
    ("10.0.0.2", "172.31.23.171", 443, 53212, 6, 20, 1200, "ACCEPT"),
    ("10.0.0.1", "192.168.1.9", 22, 60000, 6, 5, 500, "REJECT"),
    ("10.0.0.3", "8.8.8.8", 53, 33000, 17, 2, 120, "ACCEPT"),
    ("10.0.0.1", "172.31.23.171", 80, 53213, 6, 7, 7000, "REJECT"),
]


def vpcflow_line(i: int, r) -> str:
    src, dst, sp, dp, proto, pk, by, action = r
    # '-' in numeric traffic-path + sublocation cols exercises NULL markers.
    return (
        f"2 12345678901{i} eni-0abc{i:04d} {src} {dst} {sp} {dp} {proto} {pk} {by} "
        f"1600000{i}00 1600000{i}60 {action} OK vpc-1 subnet-1 i-00{i} 19 IPv4 "
        f"{src} {dst} us-east-1 use1-az1 - - - - egress -"
    )


def write_vpcflow_gz(dirpath: str, n_files: int = 2) -> list[str]:
    paths = []
    for f in range(n_files):
        lines = [VPCFLOW_HEADER] + [
            vpcflow_line(i, r) for i, r in enumerate(VPCFLOW_ROWS)
        ]
        p = os.path.join(dirpath, f"vpcflow_{f}.log.gz")
        with gzip.open(p, "wt") as fh:
            fh.write("\n".join(lines) + "\n")
        paths.append(p)
    return paths


def write_vpcflow_zip(dirpath: str, multi_entry: bool = False) -> str:
    lines = [VPCFLOW_HEADER] + [vpcflow_line(i, r) for i, r in enumerate(VPCFLOW_ROWS)]
    p = os.path.join(dirpath, "vpcflow_arch.zip" if not multi_entry else "vpcflow_multi.zip")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("inner.log", "\n".join(lines) + "\n")
        if multi_entry:
            zf.writestr("second.log", "\n".join(lines) + "\n")
    return p


ALB_ROWS = [
    # status, client, target, request (with spaces, quoted), response_time
    (200, "172.31.10.1:443", "172.31.10.146:80", "GET https://x.example.com:443/a HTTP/1.1", "0.001"),
    (500, "172.31.10.2:443", "172.31.10.146:80", "POST https://x.example.com:443/b HTTP/1.1", "-1"),
    (301, "172.31.10.3:443", "10.0.0.9:8080", "GET https://y.example.com:443/c?q=1 HTTP/1.1", "0.020"),
]


def alb_line(i: int, r) -> str:
    status, client, target, request, rt = r
    return (
        f'https 2024-01-0{i+1}T00:00:0{i}.000000Z app/my-alb/abcd {client} {target} '
        f'0.000 0.001 {rt} {status} {status} 100 200 "{request}" '
        f'"Mozilla/5.0 (X11; Linux)" ECDHE-RSA-AES128-GCM-SHA256 TLSv1.2 '
        f'arn:aws:elasticloadbalancing:us-east-1:1:targetgroup/tg/1 '
        f'"Root=1-5e1b4e{i}" x.example.com arn:aws:acm:us-east-1:1:certificate/c '
        f'0 2024-01-0{i+1}T00:00:0{i}.000000Z "forward" "-" "-" "{target}" '
        f'"{status}" "-" "-"'
    )


def write_alb_gz(dirpath: str) -> str:
    p = os.path.join(dirpath, "alb_0.log.gz")
    with gzip.open(p, "wt") as fh:
        fh.write("\n".join(alb_line(i, r) for i, r in enumerate(ALB_ROWS)) + "\n")
    return p


CLOUDFRONT_PREAMBLE = [
    "#Version: 1.0",
    "#Fields: date time x-edge-location sc-bytes c-ip cs-method cs(Host) cs-uri-stem sc-status",
]


def write_cloudfront_gz(dirpath: str) -> str:
    # Tab-delimited, 33 cols; only first 9 meaningful here, rest '-'.
    rows = []
    for i, (ip, status) in enumerate([("1.2.3.4", 200), ("1.2.3.5", 404), ("1.2.3.4", 200)]):
        cols = [f"2024-02-0{i+1}", f"00:0{i}:00", "IAD89-C1", "5000", ip, "GET",
                "d111.cloudfront.net", f"/index{i}.html", str(status)] + ["-"] * 24
        rows.append("\t".join(cols))
    p = os.path.join(dirpath, "cf_0.log.gz")
    with gzip.open(p, "wt") as fh:
        fh.write("\n".join(CLOUDFRONT_PREAMBLE + rows) + "\n")
    return p


def write_cloudtrail_gz(dirpath: str) -> str:
    records = [
        {
            "eventVersion": "1.08",
            "userIdentity": {
                "type": "AssumedRole",
                "sessionContext": {"sessionIssuer": {"userName": f"role{i}"}},
            },
            "eventTime": f"2019-09-06T03:05:0{i}Z",
            "eventSource": "ec2.amazonaws.com" if i % 2 == 0 else "s3.amazonaws.com",
            "eventName": "DescribeInstances" if i % 2 == 0 else "PutObject",
            "awsRegion": "us-east-1",
            "sourceIPAddress": f"10.0.0.{i}",
            "userAgent": "aws-cli/2",
            **({"errorCode": "AccessDenied", "errorMessage": "denied"} if i == 2 else {}),
            "requestParameters": {"instancesSet": {"items": [{"instanceId": f"i-{i}"}]}},
            "requestID": f"req-{i}",
            "eventID": f"ev-{i}",
            "eventType": "AwsApiCall",
            "recipientAccountId": "123456789012",
        }
        for i in range(4)
    ]
    p = os.path.join(dirpath, "ct_0.json.gz")
    with gzip.open(p, "wt") as fh:
        json.dump({"Records": records}, fh)
    return p


def write_windows_events(dirpath: str) -> str:
    events = [
        {
            "Id": 4624 + i, "Version": 2, "Level": 0, "Task": 12544, "Opcode": 0,
            "Keywords": -9214364837600034816.0, "RecordId": 1000 + i,
            "ProviderName": "Microsoft-Windows-Security-Auditing",
            "LogName": "Security", "ProcessId": 716, "ThreadId": 800 + i,
            "MachineName": f"host-{i}", "UserId": {"Value": f"S-1-5-{i}"},
            "Properties": [{"Value": f"v{i}"}],
            "Message": f"An account was logged on.\r\nLine two {i}",
            "DateTime": f"2024-03-0{i+1}T10:00:00",
        }
        for i in range(3)
    ]
    p = os.path.join(dirpath, "win_0.json")
    with open(p, "w") as fh:
        json.dump(events, fh)
    return p


def write_custom_csv_gz(dirpath: str) -> str:
    """B8: headerless comma CSV with '-'/''/null markers and a short row."""
    rows = [
        "1,alice,3.5,true,2024-01-01 10:00:00",
        "2,bob,-,false,2024-01-02 11:00:00",
        "3,carol,,true,",
        "4,null,7.25,NULL,2024-01-04 13:00:00",
        "garbage",  # <2 fields → quarantined
        "5,eve,1.0,true,2024-01-05 14:00:00",
    ]
    p = os.path.join(dirpath, "custom_0.csv.gz")
    with gzip.open(p, "wt") as fh:
        fh.write("\n".join(rows) + "\n")
    return p


CUSTOM_SCHEMA = "id:int, name:string, score:double, ok:boolean, ts:timestamp"


CLASSICLB_ROWS = [
    # quoted request + user agent; '-' null markers in numeric columns
    '2024-01-05T10:00:00.123456Z my-elb 10.0.0.1:54321 10.0.1.5:80 0.000073 0.001048 0.000057 200 200 0 29 "GET http://example.com:80/ HTTP/1.1" "curl/7.58" - -',
    '2024-01-05T10:00:01.000000Z my-elb 10.0.0.2:54322 10.0.1.6:80 - - - 504 0 0 0 "POST http://example.com:80/api HTTP/1.1" "Mozilla/5.0 (X11)" ECDHE-RSA-AES128 TLSv1.2',
    '2024-01-05T10:00:02.500000Z my-elb 10.0.0.3:54323 10.0.1.7:443 0.00009 0.2 0.00005 301 301 45 312 "GET https://example.com:443/a b HTTP/1.1" "-" ECDHE-RSA-AES128 TLSv1.2',
]


def write_classiclb_csv(dirpath: str) -> str:
    """ClassicLB: PLAIN (uncompressed) space-delimited CSV, no header —
    the one built-in DataType whose files arrive uncompressed."""
    p = os.path.join(dirpath, "classiclb_0.log")
    with open(p, "w") as fh:
        fh.write("\n".join(CLASSICLB_ROWS) + "\n")
    return p


NETWORKLB_ROWS = [
    'tls 2.0 2024-01-05T10:00:00 net/my-nlb/50dc6c495c0c9188 my-listener 10.0.0.1:54321 10.0.1.5:443 5 2 98 1420 - arn:aws:acm:region:123:certificate/abc 1A2B3C ECDHE-RSA-AES128-GCM-SHA256 tlsv12 - example.com h2 h2 "h2,http/1.1"',
    'tls 2.0 2024-01-05T10:00:03 net/my-nlb/50dc6c495c0c9188 my-listener 10.0.0.2:54400 10.0.1.6:443 - - 0 0 1 - - - - - - - - -',
]


def write_networklb_gz(dirpath: str) -> str:
    """NetworkLB: GZIP space-delimited CSV, no header, quoted last field."""
    p = os.path.join(dirpath, "networklb_0.log.gz")
    with gzip.open(p, "wt") as fh:
        fh.write("\n".join(NETWORKLB_ROWS) + "\n")
    return p
