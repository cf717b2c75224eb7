"""Golden print/schema formatter (reference: src/crysda/dataframe.cr:603-664).

Reproduces the reference's console rendering: title line,
``rows x cols`` header, grouping line, max_rows / max_width /
max_digits budget, row numbers, and the "and N more rows / M more
variables" footer. Only ever renders ``max_rows`` rows — the collect is
bounded regardless of table size.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from ..frame import Frame

MAX_ROWS = 10
MAX_WIDTH = 100
MAX_DIGITS = 3


def _fmt(v, max_digits: int) -> str:
    if v is None:
        return "<NA>"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.1f}"
        return f"{round(v, max_digits):g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def render(f: "Frame", title: str = "A DataFrame", col_names: bool = True,
           max_rows: int = MAX_ROWS, max_width: int = MAX_WIDTH,
           max_digits: int = MAX_DIGITS, row_numbers: bool = True) -> str:
    rows = f.sdf.limit(max_rows + 1).collect()
    more_rows = len(rows) > max_rows
    rows = rows[:max_rows]
    cols = f.columns
    n_total = f.num_row if more_rows else len(rows)

    cells = [[_fmt(r[c], max_digits) for c in cols] for r in rows]
    header = list(cols)
    widths = [max(len(header[i]), *(len(row[i]) for row in cells)) if cells else len(header[i])
              for i in range(len(cols))]

    rn_w = len(str(len(rows))) + 1 if row_numbers else 0
    budget = max_width
    shown = 0
    used = rn_w
    for wdt in widths:
        if used + wdt + 3 > budget and shown > 0:
            break
        used += wdt + 3
        shown += 1
    hidden = len(cols) - shown

    out = [f"{title}: {n_total} x {len(cols)}"]
    if f.groups:
        out.append(f"Groups: {', '.join(f.groups)}")
    if col_names:
        line = (" " * rn_w) + "   ".join(h.rjust(widths[i]) for i, h in enumerate(header[:shown]))
        out.append(line)
    for ri, row in enumerate(cells):
        prefix = f"{ri + 1}".rjust(rn_w - 1) + " " if row_numbers else ""
        out.append(prefix + "   ".join(row[i].rjust(widths[i]) for i in range(shown)))
    foot = []
    if more_rows:
        foot.append(f"and {n_total - max_rows} more rows")
    if hidden > 0:
        foot.append(f"and {hidden} more variables: {', '.join(cols[shown:])}")
    if foot:
        out.append(", ".join(foot))
    return "\n".join(out)


def schema_str(f: "Frame", max_digits: int = MAX_DIGITS, max_width: int = MAX_WIDTH) -> str:
    """``name [Type] v1, v2, ...`` per column (reference:
    src/crysda/dataframe.cr:442-458)."""
    rows = f.sdf.limit(8).collect()
    cols = f.columns
    dtypes = dict(f.sdf.dtypes)
    name_w = max((len(c) for c in cols), default=0)
    type_w = max((len(dtypes[c]) for c in cols), default=0)
    lines = [f"DataFrame with {f.num_row} observations"]
    for c in cols:
        vals = ", ".join(_fmt(r[c], max_digits) for r in rows)
        if len(vals) > max_width - name_w - type_w - 4:
            vals = vals[: max_width - name_w - type_w - 4]
        lines.append(f"{c.ljust(name_w)}  [{dtypes[c].ljust(type_w)}]  {vals}")
    return "\n".join(lines)
