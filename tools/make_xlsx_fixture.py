#!/usr/bin/env python3
"""Generate the committed .xlsx fixture + its CSV twin (oracle side).

Pure python stdlib (zipfile + hand-written OOXML parts) — deliberately an
INDEPENDENT implementation from the Scala reader, so the round-trip test
isn't self-confirming. Layout mirrors the reference workbook's pathology
(/root/reference/streamlit_app.py:43-77): junk metadata rows above the
header, so ingest must probe for the header row.

Exercises every cell encoding the reader claims: shared strings (repeated
city/make values), inline strings (one row), rich-text runs (split cell),
numbers (int + float), booleans, error cells, skipped/empty cells (sparse
<c> refs), a ragged short row, and a second decoy sheet.

Also generates the TYPED-DECODE fixtures (dated.xlsx / dated.csv /
dated1904.xlsx): numeric cells styled with date, custom datetime and
time number formats, whose CSV twin carries the ISO renderings the
Scala reader must produce under typedDates=true — including the 1900
leap-bug edge serials (1, 59, 61) and a date1904-flagged workbook.
Serial arithmetic here is independent of the Scala converter (python
datetime against the documented epochs), so agreement is evidence.

Usage: python3 tools/make_xlsx_fixture.py  (writes src/test/resources/fixtures/)
"""
import csv
import os
import zipfile
from datetime import date, datetime
from xml.sax.saxutils import escape

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/fixtures")

HEADER = ["VIN", "City", "Year", "Make", "Model", "Vehicle Type",
          "Eligibility", "Electric Range", "Vehicle ID", "Location",
          "Utility"]

# (vin, city, year, make, model, vtype, elig, range, vid, location, utility)
# deterministic; strings repeat across rows so sharedStrings indices matter
DATA = []
CITIES = ["Seattle", "Bellevue", "Tacoma", "Olympia", "Spokane"]
MAKES = ["TESLA", "NISSAN", "KIA", "AUDI"]
for i in range(40):
    vin = f"5YJ{i:04d}XLSX"
    city = CITIES[i % 5]
    year = 2012 + (i % 13)
    make = MAKES[i % 4]
    model = f"MODEL-{i % 7}"
    vtype = "Battery Electric Vehicle (BEV)" if i % 3 else \
        "Plug-in Hybrid Electric Vehicle (PHEV)"
    elig = "Clean Alternative Fuel Vehicle Eligible" if i % 2 else "Not eligible"
    erange = 80 + 7 * (i % 30)
    vid = 100000 + i
    loc = f"POINT ({-122 - (i % 9) / 10} {47 + (i % 8) / 10})"
    util = f"PUGET SOUND ENERGY INC||CITY OF {city.upper()}"
    DATA.append([vin, city, year, make, model, vtype, elig, erange, vid,
                 loc, util])

# Edge rows (still 11 columns in the CSV twin; xlsx encodes them specially):
#  - row with empty make + model (xlsx: cells omitted → sparse refs)
DATA.append(["5YJEDGE00001", "Seattle", 2020, None, None,
             "Battery Electric Vehicle (BEV)", "Not eligible", 250, 200001,
             "POINT (-122.3 47.6)", "PUGET SOUND ENERGY INC"])
#  - ragged short row (only first 4 cells present)
DATA.append(["5YJEDGE00002", "Tacoma", 2021, "KIA", None, None, None, None,
             None, None, None])
#  - float-typed range cell (integral VALUE: Spark truncates double→int,
#    DuckDB rounds — a .5 would diverge) + inline/rich-text strings
DATA.append(["5YJEDGE00003", "Bellevue", 2022, "TESLA", "MODEL-RT",
             "Battery Electric Vehicle (BEV)",
             "Clean Alternative Fuel Vehicle Eligible", 99.0, 200003,
             "POINT (-122.1 47.5)", "INLINE UTILITY CO"])
INLINE_ROW = len(DATA) - 1          # utility as inline string
RICHTEXT_ROW = len(DATA) - 1        # model as two rich-text runs
#  - missing city: q_xlsx_clean's critical-null drop must remove this row
DATA.append(["5YJEDGE00004", None, 2023, "AUDI", "MODEL-X", None, None,
             120, 200004, "POINT (-122.2 47.4)", "SEATTLE CITY LIGHT"])

JUNK = [
    ["MuseMotion EV export", None, None],
    [],
    ["generated", "2024-01-15", None, "internal"],
]


def col_letter(idx):
    s = ""
    idx += 1
    while idx:
        idx, r = divmod(idx - 1, 26)
        s = chr(ord("A") + r) + s
    return s


def main():
    os.makedirs(OUT, exist_ok=True)

    # ---- CSV twin: header + data exactly as the sheet region below the
    # header reads (None → empty field)
    with open(os.path.join(OUT, "musemotion_like.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(HEADER)
        for row in DATA:
            w.writerow(["" if v is None else v for v in row])

    # ---- xlsx: shared-string table over all repeated strings
    shared = {}

    def sref(s):
        if s not in shared:
            shared[s] = len(shared)
        return shared[s]

    def cell_xml(r, c, v, inline=False, rich=False):
        ref = f"{col_letter(c)}{r}"
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            num = repr(v) if isinstance(v, float) else str(v)
            return f'<c r="{ref}"><v>{num}</v></c>'
        if rich:  # two <r> runs that must concatenate
            h, t = v[: len(v) // 2], v[len(v) // 2:]
            return (f'<c r="{ref}" t="inlineStr"><is>'
                    f"<r><t>{escape(h)}</t></r><r><t>{escape(t)}</t></r>"
                    f"</is></c>")
        if inline:
            return (f'<c r="{ref}" t="inlineStr"><is><t>{escape(v)}</t>'
                    f"</is></c>")
        return f'<c r="{ref}" t="s"><v>{sref(v)}</v></c>'

    rows_xml = []
    rix = 0
    for junk in JUNK:
        rix += 1
        cells = "".join(cell_xml(rix, c, v) for c, v in enumerate(junk))
        rows_xml.append(f'<row r="{rix}">{cells}</row>')
    rix += 1
    hdr = "".join(cell_xml(rix, c, v) for c, v in enumerate(HEADER))
    rows_xml.append(f'<row r="{rix}">{hdr}</row>')
    for i, row in enumerate(DATA):
        rix += 1
        cells = "".join(
            cell_xml(rix, c, v,
                     inline=(i == INLINE_ROW and c == 10),
                     rich=(i == RICHTEXT_ROW and c == 4))
            for c, v in enumerate(row))
        rows_xml.append(f'<row r="{rix}">{cells}</row>')

    sheet1 = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
              '<worksheet xmlns="http://schemas.openxmlformats.org/'
              'spreadsheetml/2006/main"><sheetData>'
              + "".join(rows_xml) + "</sheetData></worksheet>")

    # decoy sheet that must NOT be read by default-sheet selection tests
    sheet2 = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
              '<worksheet xmlns="http://schemas.openxmlformats.org/'
              'spreadsheetml/2006/main"><sheetData>'
              '<row r="1"><c r="A1" t="inlineStr"><is><t>decoy</t></is></c>'
              '<c r="B1"><v>1</v></c></row>'
              '</sheetData></worksheet>')

    ss_items = "".join(
        f"<si><t>{escape(s)}</t></si>"
        for s, _ in sorted(shared.items(), key=lambda kv: kv[1]))
    shared_xml = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                  f'<sst xmlns="http://schemas.openxmlformats.org/'
                  f'spreadsheetml/2006/main" count="{len(shared)}" '
                  f'uniqueCount="{len(shared)}">{ss_items}</sst>')

    workbook = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<workbook xmlns="http://schemas.openxmlformats.org/'
                'spreadsheetml/2006/main" xmlns:r="http://schemas.'
                'openxmlformats.org/officeDocument/2006/relationships">'
                '<sheets>'
                '<sheet name="EV Data" sheetId="1" r:id="rId1"/>'
                '<sheet name="Notes" sheetId="2" r:id="rId2"/>'
                '</sheets></workbook>')

    wb_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
               '<Relationships xmlns="http://schemas.openxmlformats.org/'
               'package/2006/relationships">'
               '<Relationship Id="rId1" Type="http://schemas.openxmlformats'
               '.org/officeDocument/2006/relationships/worksheet" '
               'Target="worksheets/sheet1.xml"/>'
               '<Relationship Id="rId2" Type="http://schemas.openxmlformats'
               '.org/officeDocument/2006/relationships/worksheet" '
               'Target="worksheets/sheet2.xml"/>'
               '<Relationship Id="rId3" Type="http://schemas.openxmlformats'
               '.org/officeDocument/2006/relationships/sharedStrings" '
               'Target="sharedStrings.xml"/>'
               '</Relationships>')

    root_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                 '<Relationships xmlns="http://schemas.openxmlformats.org/'
                 'package/2006/relationships">'
                 '<Relationship Id="rId1" Type="http://schemas.'
                 'openxmlformats.org/officeDocument/2006/relationships/'
                 'officeDocument" Target="xl/workbook.xml"/>'
                 '</Relationships>')

    content_types = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                     '<Types xmlns="http://schemas.openxmlformats.org/'
                     'package/2006/content-types">'
                     '<Default Extension="xml" ContentType="application/xml"/>'
                     '<Default Extension="rels" ContentType="application/vnd.'
                     'openxmlformats-package.relationships+xml"/>'
                     '<Override PartName="/xl/workbook.xml" ContentType='
                     '"application/vnd.openxmlformats-officedocument.'
                     'spreadsheetml.sheet.main+xml"/>'
                     '<Override PartName="/xl/worksheets/sheet1.xml" '
                     'ContentType="application/vnd.openxmlformats-'
                     'officedocument.spreadsheetml.worksheet+xml"/>'
                     '<Override PartName="/xl/worksheets/sheet2.xml" '
                     'ContentType="application/vnd.openxmlformats-'
                     'officedocument.spreadsheetml.worksheet+xml"/>'
                     '<Override PartName="/xl/sharedStrings.xml" ContentType='
                     '"application/vnd.openxmlformats-officedocument.'
                     'spreadsheetml.sharedStrings+xml"/>'
                     '</Types>')

    path = os.path.join(OUT, "musemotion_like.xlsx")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        # sheet BEFORE sharedStrings on purpose: readers must not assume
        # zip entry order
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/worksheets/sheet1.xml", sheet1)
        z.writestr("xl/worksheets/sheet2.xml", sheet2)
        z.writestr("xl/sharedStrings.xml", shared_xml)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
    print(f"wrote {path} ({os.path.getsize(path)} bytes) + csv twin")


# ---------------------------------------------------------------------------
# Typed-decode fixtures: dated.xlsx (1900 system) + dated.csv twin +
# dated1904.xlsx (date1904 workbook, unit-spec only).
# ---------------------------------------------------------------------------

EPOCH_1900 = date(1899, 12, 30)     # valid for serials >= 61 (post leap bug)


def dserial(d):
    n = (d - EPOCH_1900).days
    assert n >= 61, "helper only valid past the 1900 leap bug"
    return n


def dtserial(dt):
    return dserial(dt.date()) + \
        (dt.hour * 3600 + dt.minute * 60 + dt.second) / 86400.0


DATED_HEADER = ["Event ID", "Name", "Registration Date", "Last Seen",
                "Duration", "Score", "Elapsed"]

# (id, name, reg_date, last_seen, duration_secs, score); regular rows use
# real dates, edge rows inject raw serials directly (see below)
DATED_ROWS = []
NAMES = ["alpha", "beta", "gamma", "delta"]
for i in range(12):
    d = date(2015 + (i % 9), 1 + (i * 3) % 12, 1 + (i * 7) % 28)
    ts = datetime(d.year, d.month, d.day, (i * 5) % 24, (i * 11) % 60,
                  (i * 17) % 60)
    DATED_ROWS.append([f"E{100 + i}", NAMES[i % 4], d, ts,
                       (i * 3731) % 86400, 0.5 + i])

# Leap-bug edge serials (1900 system): 1 -> 1900-01-01 (pre-bug epoch
# 1899-12-31), 59 -> 1900-02-28, 61 -> 1900-03-01 (post-bug epoch
# 1899-12-30). Serial 60 (the fictitious 1900-02-29) is pinned in the
# unit spec, not the oracle gate — engines legitimately disagree on it.
EDGE_SERIALS = [("E900", "edge", 1, "1900-01-01"),
                ("E901", "edge", 59, "1900-02-28"),
                ("E902", "edge", 61, "1900-03-01")]


def dated_cell(r, c, v, style=None):
    ref = f"{col_letter(c)}{r}"
    if v is None:
        return ""
    if isinstance(v, str):
        return (f'<c r="{ref}" t="inlineStr"><is><t>{escape(v)}</t></is></c>')
    s = f' s="{style}"' if style else ""
    num = repr(v) if isinstance(v, float) else str(v)
    return f'<c r="{ref}"{s}><v>{num}</v></c>'


# styles.xml: xf 1 = built-in date (14), xf 2 = custom datetime (164),
# xf 3 = built-in time h:mm:ss (21). xf 0 is the required General slot.
DATED_STYLES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<styleSheet xmlns="http://schemas.openxmlformats.org/'
    'spreadsheetml/2006/main">'
    '<numFmts count="2">'
    '<numFmt numFmtId="164" formatCode="yyyy\\-mm\\-dd hh:mm:ss"/>'
    '<numFmt numFmtId="165" formatCode="[h]:mm:ss"/>'
    '</numFmts>'
    '<cellXfs count="5">'
    '<xf numFmtId="0"/>'
    '<xf numFmtId="14" applyNumberFormat="1"/>'
    '<xf numFmtId="164" applyNumberFormat="1"/>'
    '<xf numFmtId="21" applyNumberFormat="1"/>'
    '<xf numFmtId="165" applyNumberFormat="1"/>'
    '</cellXfs></styleSheet>')


def write_dated_workbook(path, rows_xml, date1904=False):
    pr = '<workbookPr date1904="1"/>' if date1904 else ""
    workbook = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<workbook xmlns="http://schemas.openxmlformats.org/'
                'spreadsheetml/2006/main" xmlns:r="http://schemas.'
                'openxmlformats.org/officeDocument/2006/relationships">'
                f'{pr}<sheets>'
                '<sheet name="Events" sheetId="1" r:id="rId1"/>'
                '</sheets></workbook>')
    wb_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
               '<Relationships xmlns="http://schemas.openxmlformats.org/'
               'package/2006/relationships">'
               '<Relationship Id="rId1" Type="http://schemas.openxmlformats'
               '.org/officeDocument/2006/relationships/worksheet" '
               'Target="worksheets/sheet1.xml"/>'
               '<Relationship Id="rId2" Type="http://schemas.openxmlformats'
               '.org/officeDocument/2006/relationships/styles" '
               'Target="styles.xml"/>'
               '</Relationships>')
    root_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                 '<Relationships xmlns="http://schemas.openxmlformats.org/'
                 'package/2006/relationships">'
                 '<Relationship Id="rId1" Type="http://schemas.'
                 'openxmlformats.org/officeDocument/2006/relationships/'
                 'officeDocument" Target="xl/workbook.xml"/>'
                 '</Relationships>')
    content_types = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                     '<Types xmlns="http://schemas.openxmlformats.org/'
                     'package/2006/content-types">'
                     '<Default Extension="xml" ContentType="application/xml"/>'
                     '<Default Extension="rels" ContentType="application/vnd.'
                     'openxmlformats-package.relationships+xml"/>'
                     '<Override PartName="/xl/workbook.xml" ContentType='
                     '"application/vnd.openxmlformats-officedocument.'
                     'spreadsheetml.sheet.main+xml"/>'
                     '<Override PartName="/xl/worksheets/sheet1.xml" '
                     'ContentType="application/vnd.openxmlformats-'
                     'officedocument.spreadsheetml.worksheet+xml"/>'
                     '<Override PartName="/xl/styles.xml" ContentType='
                     '"application/vnd.openxmlformats-officedocument.'
                     'spreadsheetml.styles+xml"/>'
                     '</Types>')
    sheet1 = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
              '<worksheet xmlns="http://schemas.openxmlformats.org/'
              'spreadsheetml/2006/main"><sheetData>'
              + "".join(rows_xml) + "</sheetData></worksheet>")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/styles.xml", DATED_STYLES)
        z.writestr("xl/worksheets/sheet1.xml", sheet1)
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


def hms(secs):
    return f"{secs // 3600:02d}:{(secs // 60) % 60:02d}:{secs % 60:02d}"


def elapsed_hms(secs):
    # [h]-style duration rendering: TOTAL hours (no zero-pad, no mod-24)
    return f"{secs // 3600}:{(secs // 60) % 60:02d}:{secs % 60:02d}"


def main_dated():
    rows_xml = []
    csv_rows = []
    rix = 1
    # one junk row above the header so the probe path is exercised
    rows_xml.append(f'<row r="{rix}">{dated_cell(rix, 0, "events export")}'
                    '</row>')
    rix += 1
    hdr = "".join(dated_cell(rix, c, v) for c, v in enumerate(DATED_HEADER))
    rows_xml.append(f'<row r="{rix}">{hdr}</row>')
    for i, (eid, name, d, ts, dur, score) in enumerate(DATED_ROWS):
        rix += 1
        # elapsed durations deliberately exceed 24h on most rows — the
        # [h]:mm:ss column must render totals, never wrap (i=0 stays
        # sub-24h to pin the boundary-free case too)
        el = (i * 90137) % 200000
        cells = (dated_cell(rix, 0, eid) + dated_cell(rix, 1, name) +
                 dated_cell(rix, 2, dserial(d), style=1) +
                 dated_cell(rix, 3, dtserial(ts), style=2) +
                 dated_cell(rix, 4, dur / 86400.0, style=3) +
                 dated_cell(rix, 5, score) +
                 dated_cell(rix, 6, el / 86400.0, style=4))
        rows_xml.append(f'<row r="{rix}">{cells}</row>')
        csv_rows.append([eid, name, d.isoformat(),
                         ts.strftime("%Y-%m-%d %H:%M:%S"), hms(dur), score,
                         elapsed_hms(el)])
    for eid, name, serial, iso in EDGE_SERIALS:
        rix += 1
        cells = (dated_cell(rix, 0, eid) + dated_cell(rix, 1, name) +
                 dated_cell(rix, 2, serial, style=1))
        rows_xml.append(f'<row r="{rix}">{cells}</row>')
        csv_rows.append([eid, name, iso, "", "", "", ""])
    # a date that arrives as TEXT must pass through untouched
    rix += 1
    cells = (dated_cell(rix, 0, "E903") + dated_cell(rix, 1, "textdate") +
             dated_cell(rix, 2, "2020-05-05"))
    rows_xml.append(f'<row r="{rix}">{cells}</row>')
    csv_rows.append(["E903", "textdate", "2020-05-05", "", "", "", ""])

    write_dated_workbook(os.path.join(OUT, "dated.xlsx"), rows_xml)
    with open(os.path.join(OUT, "dated.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(DATED_HEADER)
        for row in csv_rows:
            w.writerow(["" if v is None else v for v in row])
    print(f"wrote dated.csv ({len(csv_rows)} rows)")

    # 1904-system twin (unit-spec only): serial 0 -> 1904-01-01,
    # serial 100.5 -> 1904-04-10 12:00:00 under numFmt 164
    rows_xml = []
    hdr = "".join(dated_cell(1, c, v)
                  for c, v in enumerate(["Id", "D", "TS"]))
    rows_xml.append(f'<row r="1">{hdr}</row>')
    rows_xml.append(f'<row r="2">{dated_cell(2, 0, "R1")}'
                    f'{dated_cell(2, 1, 0, style=1)}'
                    f'{dated_cell(2, 2, 100.5, style=2)}</row>')
    write_dated_workbook(os.path.join(OUT, "dated1904.xlsx"), rows_xml,
                         date1904=True)


if __name__ == "__main__":
    main()
    main_dated()
