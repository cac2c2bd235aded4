"""Pipeline configuration: TOML -> frozen plan dataclasses.

This is the engine's "query language", mirroring the config surface of
the reference (``config.go:242-504``, ``transform.go:76-123``,
``README.md:44-196``): per log group a regex suite, an arity contract,
tag positions, metric references with scaling/arithmetic, transform
chains, and aggregation/push parameters; plus global sink settings.

Differences from the reference are deliberate and documented:

- TOML instead of json-ish YAML.
- Three reference quirks are *fixed by default* and replayable via
  ``[log_groups.X.compat]`` flags (see :class:`CompatFlags`).
- ``default_year`` makes the rfc3164 missing-year patch deterministic
  (the reference uses the wall-clock year, ``datapool.go:132-136``).
- ``files`` globs become an optional ``url_match`` regex filter over
  the source table's ``url`` column (the url plays the role of the
  filename; ``filename_match`` capture groups are appended after the
  line groups exactly like ``logtail.go:131-134``).

All validation is fail-fast with explicit errors, like the reference's
``log.Fatalf`` checks (e.g. ``config.go:193,199-201,222-224``).
"""

from __future__ import annotations

import re
import tomllib
from dataclasses import dataclass, field

from .regexc import compile_clean, go_layout_to_strptime, layout_has_year

VALID_METRIC_TYPES = ("meter", "histogram", "counter")
VALID_OPS = ("add", "sub")
METRIC_ENDINGS = {
    # key endings emitted per metric type (reference README "Keys generated")
    "counter": ("count",),
    "meter": ("count", "rate._1min", "rate._5min", "rate._15min"),
    "histogram": (
        "min", "max", "mean", "std_dev",
        "p50", "p75", "p95", "p99", "p999", "sample_size",
    ),
}


class ConfigError(ValueError):
    """Fail-fast config validation error."""


@dataclass(frozen=True)
class CompatFlags:
    """Replay reference quirks bit-for-bit when True; default is the
    fixed, deterministic behavior (SURVEY.md §2.2 / §1.3).

    - ``float_noscale_zero``: with ``format="float"`` and
      ``multiply == divide == 1`` the reference never assigns the
      parsed value, so it stays 0 (``datapool.go:150-155``).
      Fixed behavior: plain ``int(float(x))`` truncation.
    - ``cumulative_ops``: the reference mutates the shared positional
      value across successive references at the same position, so a
      later reference sees the earlier one's add/sub result
      (``datapool.go:181-211``). Fixed behavior: each reference is
      computed independently.
    - ``transform_apply_all``: the reference resets its
      ``replace_only_one`` latch every operation, so the flag never
      actually short-circuits (``transform.go:48-60``). Fixed
      behavior: stop the chain after the first successful replace.
    """

    float_noscale_zero: bool = False
    cumulative_ops: bool = False
    transform_apply_all: bool = False


@dataclass(frozen=True)
class MetricRef:
    """One ``reference`` entry: ``[position, "tag=v", {sub = [...]}]``
    (reference ``config.go:206-230``). ``position == 0`` means
    "count this line as 1" (``datapool.go:142-143``)."""

    position: int
    tag: str = ""
    add: tuple[int, ...] = ()
    sub: tuple[int, ...] = ()


@dataclass(frozen=True)
class MetricDef:
    """One metric block (``key_suffix`` + references); reference
    ``keyExtract``, ``config.go:42-52,171-240``."""

    metric_type: str
    key_suffix: str
    value_format: str = "int"  # "int" | "float"
    multiply: int = 1
    divide: int = 1
    never_stale: bool = False
    references: tuple[MetricRef, ...] = ()


@dataclass(frozen=True)
class TransformOp:
    kind: str  # "replace" | "match_or_default"
    pattern: str
    arg: str  # replace template with @@n@@ backrefs, or default literal


@dataclass(frozen=True)
class TransformDef:
    """Per-position transform chain (reference ``transform.go:12-17``)."""

    position: int
    replace_only_one: bool = False
    log_default_assign: bool = False
    operations: tuple[TransformOp, ...] = ()


@dataclass(frozen=True)
class DateSpec:
    """Where/how to parse the event time from the match groups
    (reference ``config.go:450-459``). ``position == -1`` means "use
    the source table's ``warc_ts`` column" (pages mode)."""

    position: int = -1
    go_format: str = ""
    strptime_format: str = ""
    has_year: bool = True


@dataclass(frozen=True)
class LogGroup:
    name: str
    regexes: tuple[str, ...]  # cleaned patterns, first-match-wins order
    expected_matches: int
    key_prefix: str
    date: DateSpec = field(default_factory=DateSpec)
    url_match: str | None = None  # rows whose url doesn't match are skipped
    filename_match: str | None = None  # url capture groups appended after line groups
    tags: tuple[tuple[str, int | str], ...] = ()  # (name, position-or-literal), sorted by name
    metrics: tuple[MetricDef, ...] = ()
    transforms: tuple[TransformDef, ...] = ()
    lookup: str | None = None  # broadcast enrichment table name (north_star extension)
    lookup_key_position: int = 0  # match-group position joined against lookup.host

    histogram_size: int = 256
    histogram_alpha_decay: float = 0.15
    histogram_rescale_threshold_min: int = 60
    ewma_interval: int = 30
    interval: int = 15
    stale_removal: bool = False
    stale_treshold_min: int = 60
    send_duplicates: bool = False
    live_poll: bool = True
    goroutines: int = 1
    parse_from_start: bool = False
    max_line_size: int = 2048
    default_year: int | None = None

    warn_on_regex_fail: bool = False
    warn_on_operation_fail: bool = False
    warn_on_out_of_order_time: bool = False
    log_stale_metrics: bool = False

    compat: CompatFlags = field(default_factory=CompatFlags)

    # ---- derived helpers (computed, not configured) ----

    def tag_order(self) -> list[str]:
        """Alphabetical tag emission order (reference ``datapool.go:59-69``)."""
        return sorted(name for name, _ in self.tags)

    def nb_keys(self) -> int:
        """Datapoints per matched line (reference ``config.go:99-105``)."""
        return sum(len(m.references) for m in self.metrics)

    def transform_by_position(self) -> dict[int, TransformDef]:
        return {t.position: t for t in self.transforms}

    def endings(self, metric_type: str) -> tuple[str, ...]:
        return METRIC_ENDINGS[metric_type]


@dataclass(frozen=True)
class Settings:
    """Global sink settings (reference ``config.go:17-29,242-300``)."""

    push_number: int = 1
    push_type: str = "tsd"  # "tsd" prepends "put " to lines
    push_host: str = "localhost"
    push_port: int = 4242
    push_proto: str = "tcp"
    push_wait: int = 15
    poll_interval: int = 15
    stats_interval: int = 60
    log_facility: str = "local0"  # syslog facility (config.go:283-288)


@dataclass(frozen=True)
class PipelineConfig:
    settings: Settings
    log_groups: tuple[LogGroup, ...]

    def group(self, name: str) -> LogGroup:
        for lg in self.log_groups:
            if lg.name == name:
                return lg
        raise KeyError(name)


# --------------------------------------------------------------------------
# parsing
# --------------------------------------------------------------------------

def _parse_ref(entry: list) -> MetricRef:
    if not entry or not isinstance(entry[0], int):
        raise ConfigError(f"metric reference must start with a position int: {entry!r}")
    position = entry[0]
    tag = ""
    add: tuple[int, ...] = ()
    sub: tuple[int, ...] = ()
    for item in entry[1:]:
        if isinstance(item, str):
            tag = item
        elif isinstance(item, dict):
            for op, positions in item.items():
                if op not in VALID_OPS:
                    raise ConfigError(f"unsupported operation {op!r} (valid: {VALID_OPS})")
                vals = tuple(int(p) for p in positions)
                if op == "add":
                    add = vals
                else:
                    sub = vals
        else:
            raise ConfigError(f"bad reference element {item!r} in {entry!r}")
    return MetricRef(position=position, tag=tag, add=add, sub=sub)


def _parse_metric_block(metric_type: str, block: dict) -> MetricDef:
    if metric_type not in VALID_METRIC_TYPES:
        raise ConfigError(f"unsupported metric type {metric_type!r}")
    known = {"key_suffix", "format", "multiply", "divide", "never_stale", "reference"}
    unknown = set(block) - known
    if unknown:
        raise ConfigError(f"unknown keys in metric block: {sorted(unknown)}")
    multiply = int(block.get("multiply", 1))
    divide = int(block.get("divide", 1))
    if multiply == 0 or divide == 0:
        raise ConfigError("multiply/divide cannot be 0")  # config.go:193,199-201
    refs = tuple(_parse_ref(r) for r in block.get("reference", []))
    if not refs:
        raise ConfigError(f"metric block {block.get('key_suffix')!r} has no references")
    return MetricDef(
        metric_type=metric_type,
        key_suffix=str(block["key_suffix"]),
        value_format=str(block.get("format", "int")),
        multiply=multiply,
        divide=divide,
        never_stale=bool(block.get("never_stale", False)),
        references=refs,
    )


def _parse_transforms(raw: dict) -> tuple[TransformDef, ...]:
    out = []
    for pos_str, tblock in raw.items():
        ops = []
        for args in tblock.get("operations", []):
            if len(args) != 3 or args[0] not in ("replace", "match_or_default"):
                raise ConfigError(f"bad transform operation {args!r}")
            compile_clean(args[1])  # validate pattern now, fail fast
            ops.append(TransformOp(kind=args[0], pattern=args[1], arg=args[2]))
        if not ops:
            raise ConfigError(f"no operations under transform group {pos_str}")
        out.append(
            TransformDef(
                position=int(pos_str),
                replace_only_one=bool(tblock.get("replace_only_one", False)),
                log_default_assign=bool(tblock.get("log_default_assign", False)),
                operations=tuple(ops),
            )
        )
    return tuple(sorted(out, key=lambda t: t.position))


def _parse_group(name: str, raw: dict) -> LogGroup:
    if "re" not in raw or not raw["re"]:
        raise ConfigError(f"log group {name!r} has no regexes")
    regexes = []
    ngroups = None
    for pattern in raw["re"]:
        compiled = compile_clean(pattern)
        if ngroups is None:
            ngroups = compiled.groups
        elif compiled.groups != ngroups:
            # reference requires identical group counts across alternatives
            raise ConfigError(f"regex alternatives in {name!r} have differing group counts")
        regexes.append(compiled.pattern)

    expected = int(raw.get("expected_matches", ngroups))
    if ngroups != expected:
        raise ConfigError(
            f"log group {name!r}: expected_matches={expected} but regex has {ngroups} groups"
        )

    date_raw = raw.get("date")
    if date_raw is None:
        date = DateSpec()  # pages mode: event time = warc_ts column
    else:
        go_fmt = str(date_raw["format"])
        date = DateSpec(
            position=int(date_raw["position"]),
            go_format=go_fmt,
            strptime_format=go_layout_to_strptime(go_fmt),
            has_year=layout_has_year(go_fmt),
        )

    metrics = []
    for metric_type, blocks in raw.get("metrics", {}).items():
        for block in blocks:
            metrics.append(_parse_metric_block(metric_type, block))
    if not metrics:
        raise ConfigError(f"log group {name!r} defines no metrics")

    tags = tuple(sorted(raw.get("tags", {}).items()))
    for tag_name, pos_or_lit in tags:
        if not isinstance(pos_or_lit, (int, str)):
            raise ConfigError(f"tag {tag_name!r} must be a position int or literal string")

    filename_match = raw.get("filename_match")
    if filename_match:
        re.compile(filename_match)  # validate

    compat_raw = raw.get("compat", {})
    compat = CompatFlags(
        float_noscale_zero=bool(compat_raw.get("float_noscale_zero", False)),
        cumulative_ops=bool(compat_raw.get("cumulative_ops", False)),
        transform_apply_all=bool(compat_raw.get("transform_apply_all", False)),
    )

    return LogGroup(
        name=name,
        regexes=tuple(regexes),
        expected_matches=expected,
        key_prefix=str(raw.get("key_prefix", name)),
        date=date,
        url_match=raw.get("url_match"),
        filename_match=filename_match,
        tags=tags,
        metrics=tuple(metrics),
        transforms=_parse_transforms(raw.get("transform", {})),
        lookup=raw.get("lookup"),
        lookup_key_position=int(raw.get("lookup_key_position", 0)),
        histogram_size=int(raw.get("histogram_size", 256)),
        histogram_alpha_decay=float(raw.get("histogram_alpha_decay", 0.15)),
        histogram_rescale_threshold_min=int(raw.get("histogram_rescale_threshold_min", 60)),
        ewma_interval=int(raw.get("ewma_interval", 30)),
        interval=int(raw.get("interval", 15)),
        stale_removal=bool(raw.get("stale_removal", False)),
        stale_treshold_min=int(raw.get("stale_treshold_min", 60)),
        send_duplicates=bool(raw.get("send_duplicates", False)),
        live_poll=bool(raw.get("live_poll", True)),
        goroutines=int(raw.get("goroutines", 1)),
        parse_from_start=bool(raw.get("parse_from_start", False)),
        max_line_size=int(raw.get("max_line_size", 2048)),
        default_year=raw.get("default_year"),
        warn_on_regex_fail=bool(raw.get("warn_on_regex_fail", False)),
        warn_on_operation_fail=bool(raw.get("warn_on_operation_fail", False)),
        warn_on_out_of_order_time=bool(raw.get("warn_on_out_of_order_time", False)),
        log_stale_metrics=bool(raw.get("log_stale_metrics", False)),
        compat=compat,
    )


def load_config_dict(raw: dict) -> PipelineConfig:
    settings_raw = raw.get("settings", {})
    settings = Settings(
        push_number=int(settings_raw.get("push_number", 1)),
        push_type=str(settings_raw.get("push_type", "tsd")),
        push_host=str(settings_raw.get("push_host", "localhost")),
        push_port=int(settings_raw.get("push_port", 4242)),
        push_proto=str(settings_raw.get("push_proto", "tcp")),
        push_wait=int(settings_raw.get("push_wait", 15)),
        poll_interval=int(settings_raw.get("poll_interval", 15)),
        stats_interval=int(settings_raw.get("stats_interval", 60)),
        log_facility=str(settings_raw.get("log_facility", "local0")),
    )
    # fail at load on an unmappable facility (config.go:288 log.Fatalf),
    # surfaced through the module's uniform ConfigError contract
    from .syslog_facility import get_syslog_priority

    try:
        get_syslog_priority(settings.log_facility)
    except ValueError as e:
        raise ConfigError(str(e)) from e
    groups_raw = raw.get("log_groups", {})
    if not groups_raw:
        raise ConfigError("config defines no log_groups")
    groups = tuple(_parse_group(name, g) for name, g in sorted(groups_raw.items()))
    return PipelineConfig(settings=settings, log_groups=groups)


def load_config(path: str) -> PipelineConfig:
    with open(path, "rb") as fh:
        return load_config_dict(tomllib.load(fh))


def load_config_str(toml_text: str) -> PipelineConfig:
    return load_config_dict(tomllib.loads(toml_text))
