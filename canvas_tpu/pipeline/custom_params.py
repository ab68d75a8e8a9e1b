"""--custom-parameters pass-through (Canvas/CommandOptionsUtilities.cs).

The reference lets the orchestrator CLI append/override per-stage flags:
``--custom-parameters=CanvasBin,-m Fragment`` is merged into the CanvasBin
subprocess command line by MergeCommandLineOptions
(CommandOptionsUtilities.cs:20-73, used at CanvasRunner.cs:316-320).  Here
stages are in-process functions, so the merged flag strings are translated
onto CanvasConfig fields; the string-merge semantics (override in place,
insert new options, ``#foo`` removals) are reproduced so tuned reference
command lines carry over unchanged.
"""

from __future__ import annotations

import re


def get_command_options(command: str) -> tuple[str, list[list[str]]]:
    """Parse a flag string into (before_first_option, [[key, value], ...]).

    Mirrors CommandOptionsUtilities.GetCommandOptions: keys keep their
    dashes; ``--key=value`` keeps the ``=`` in the value; a following
    whitespace token is the value when it is not itself an option (negative
    numbers like ``-4`` count as values, CommandOptionsUtilities.cs:18)."""
    tokens = command.split()
    options: list[list[str]] = []
    before: list[str] = []
    i = 0
    while i < len(tokens) and not _is_option(tokens[i]):
        before.append(tokens[i])
        i += 1
    while i < len(tokens):
        tok = tokens[i]
        if "=" in tok:
            key, _, val = tok.partition("=")
            options.append([key, "=" + val])
            i += 1
            continue
        key = tok
        i += 1
        vals = []
        while i < len(tokens) and not _is_option(tokens[i]):
            vals.append(tokens[i])
            i += 1
        options.append([key, (" " + " ".join(vals)) if vals else ""])
    return " ".join(before), options


def _is_option(token: str) -> bool:
    if token.startswith("#"):
        return True
    if not token.startswith("-"):
        return False
    # "-4" is a (negative-number) value, not an option
    return not re.match(r"^-\d", token)


def merge_command_line_options(command: str, more_options: str,
                               insert_at_end: bool = False) -> str:
    """MergeCommandLineOptions (CommandOptionsUtilities.cs:20-73):
    existing options are overridden in place; new ones are inserted after
    the last updated option (or at the start/end); ``#foo`` removes
    -foo/--foo and its value."""
    if not more_options:
        return command
    before, options = get_command_options(command)
    before_new, new_options = get_command_options(more_options)
    if before_new.strip():
        raise ValueError(f"Unknown options format {more_options!r}")

    last_updated = -1
    for key, value in new_options:
        if key.startswith("#"):
            bare = key[1:]
            kept = []
            for idx, opt in enumerate(options):
                if opt[0].lstrip("-") == bare:
                    if last_updated >= idx:
                        last_updated -= 1
                else:
                    kept.append(opt)
            options[:] = kept
            continue
        idx = next((j for j, opt in enumerate(options) if opt[0] == key), -1)
        if idx != -1:
            options[idx][1] = value
            last_updated = idx
        else:
            if last_updated == -1:
                insert_at = len(options) if insert_at_end else 0
            else:
                insert_at = last_updated + 1
            options.insert(insert_at, [key, value])
            last_updated = insert_at

    parts = [before] if before else []
    for key, value in options:
        parts.append(key + value)
    return " ".join(parts)


def parse_custom_parameters(entries: list[str]) -> dict[str, str]:
    """Parse repeated ``Tool,flag-string`` entries (MainParser's
    --custom-parameters), merging repeats for the same tool."""
    out: dict[str, str] = {}
    for entry in entries or []:
        tool, _, flags = entry.partition(",")
        tool = tool.strip()
        if not tool or not flags:
            raise ValueError(
                f"--custom-parameters needs 'Tool,flags', got {entry!r}")
        if tool.lower() in {k.lower() for k in out}:
            key = next(k for k in out if k.lower() == tool.lower())
            out[key] = merge_command_line_options(out[key], flags,
                                                  insert_at_end=True)
        else:
            out[tool] = flags.strip()
    return out


# flag -> (config field, converter); key variants per stage OptionSet
_CANVASBIN_FLAGS = {
    "-d": ("counts_per_bin", int), "--bindepth": ("counts_per_bin", int),
    "-z": ("fixed_bin_size", int), "--binsize": ("fixed_bin_size", int),
    "-m": ("coverage_mode", str), "--mode": ("coverage_mode", str),
}
_CANVASCLEAN_FLAGS = {
    "-m": ("gc_norm_mode", str), "--mode": ("gc_norm_mode", str),
    "-w": ("min_bins_per_gc_weighted_median", int),
    "--weightedmedian": ("min_bins_per_gc_weighted_median", int),
}
_CANVASPARTITION_FLAGS = {
    "-m": ("partition_method", str), "--method": ("partition_method", str),
}
_CANVASNORMALIZE_FLAGS = {
    "-m": ("normalize_mode", str), "--mode": ("normalize_mode", str),
}

_STAGE_FLAGS = {
    "canvasbin": _CANVASBIN_FLAGS,
    "canvasclean": _CANVASCLEAN_FLAGS,
    "canvaspartition": _CANVASPARTITION_FLAGS,
    "canvasnormalize": _CANVASNORMALIZE_FLAGS,
}

# reference CanvasCoverageMode spellings (Utilities.ParseCanvasCoverageMode)
_COVERAGE_MODES = {
    "0": "Binary", "binary": "Binary",
    "1": "TruncatedDynamicRange", "truncateddynamicrange":
        "TruncatedDynamicRange",
    "2": "GCContentWeighted", "gccontentweighted": "GCContentWeighted",
    "3": "Fragment", "fragment": "Fragment",
}


def apply_custom_parameters(config, custom: dict[str, str]) -> None:
    """Translate merged per-stage flag strings onto CanvasConfig fields.
    Unknown tools or flags raise — a typo must not silently no-op."""
    for tool, flags in custom.items():
        stage = _STAGE_FLAGS.get(tool.lower())
        if stage is None:
            raise ValueError(f"--custom-parameters: unknown tool {tool!r}")
        _, options = get_command_options(flags)
        for key, value in options:
            if key not in stage:
                raise ValueError(
                    f"--custom-parameters: unsupported {tool} flag {key!r}")
            field_name, conv = stage[key]
            raw = value.lstrip("= ").strip()
            val = conv(raw)
            if field_name == "coverage_mode":
                mode = _COVERAGE_MODES.get(str(val).lower())
                if mode is None:
                    raise ValueError(f"unknown coverage mode {raw!r}")
                val = mode
            setattr(config, field_name, val)
