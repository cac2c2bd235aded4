"""Syslog facility lookup (reference ``syslog_helper.go:1-26``,
``config.go:283-288,310-312``).

The reference maps the ``log_facility`` config string to a syslog
priority for its daemon logger (``main/logmetrics_collector.go:61``).
This module replays the same surface on public constants: facility
numbers from RFC 5424 / POSIX ``<syslog.h>`` (the values behind Go's
``syslog.LOG_*``), combined with LOG_INFO severity exactly like
``config.go:286`` (``LOG_INFO | facility``). Unknown names raise —
the reference's ``log.Fatalf`` analog — and the default facility is
``local0`` (``config.go:310-312``)."""

from __future__ import annotations

LOG_INFO = 6  # severity

# RFC 5424 facility codes; the priority encoding is facility<<3
FACILITY_CODES: dict[str, int] = {
    "kern": 0,
    "user": 1,
    "mail": 2,
    "daemon": 3,
    "auth": 4,
    "syslog": 5,
    "lpr": 6,
    "news": 7,
    "uucp": 8,
    "cron": 9,
    "authpriv": 10,
    "ftp": 11,
    "local0": 16,
    "local1": 17,
    "local2": 18,
    "local3": 19,
    "local4": 20,
    "local5": 21,
    "local6": 22,
    "local7": 23,
}

DEFAULT_FACILITY = "local0"


def get_syslog_priority(name: str | None) -> int:
    """``log_facility`` string -> LOG_INFO|facility priority int
    (``config.go:283-288``); None/'' -> local0 (``config.go:310``)."""
    if not name:
        name = DEFAULT_FACILITY
    if name not in FACILITY_CODES:
        raise ValueError(f"Unable to map log_facility: {name}")
    return (FACILITY_CODES[name] << 3) | LOG_INFO
