#!/usr/bin/env python3
"""Extract every sheet of an .xlsx workbook to CSV using only the stdlib
(no openpyxl in this container): an xlsx is a zip of XML — shared strings
in xl/sharedStrings.xml, sheet name->file mapping via xl/workbook.xml +
xl/_rels/workbook.xml.rels, cell values in xl/worksheets/sheetN.xml.

Used once to turn the reference's ground-truth export
(/root/reference/superstore_dw_export.xlsx, written by generate_excel.py)
into golden CSV fixtures for value-level warehouse parity tests.

Usage: extract_xlsx.py <workbook.xlsx> <outdir>
"""
import sys, os, csv, re, zipfile
import xml.etree.ElementTree as ET

NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main",
      "r": "http://schemas.openxmlformats.org/officeDocument/2006/relationships"}

def col_index(ref):  # "BC12" -> 54 (0-based column)
    s = re.match(r"[A-Z]+", ref).group(0)
    n = 0
    for ch in s:
        n = n * 26 + (ord(ch) - 64)
    return n - 1

def main(path, outdir):
    os.makedirs(outdir, exist_ok=True)
    z = zipfile.ZipFile(path)
    shared = []
    if "xl/sharedStrings.xml" in z.namelist():
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
        for si in root.findall("m:si", NS):
            shared.append("".join(t.text or "" for t in si.iter(
                "{%s}t" % NS["m"])))
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rid2target = {rel.get("Id"): rel.get("Target")
                  for rel in rels.iter("{http://schemas.openxmlformats.org/package/2006/relationships}Relationship")}
    for sheet in wb.find("m:sheets", NS):
        name = sheet.get("name")
        target = rid2target[sheet.get("{%s}id" % NS["r"])]
        if not target.startswith("/"):
            target = "xl/" + target
        ws = ET.fromstring(z.read(target.lstrip("/")))
        rows = []
        for row in ws.iter("{%s}row" % NS["m"]):
            cells = {}
            for c in row.findall("m:c", NS):
                ref, typ = c.get("r"), c.get("t")
                v = c.find("m:v", NS)
                if typ == "inlineStr":
                    is_ = c.find("m:is", NS)
                    val = "".join(t.text or "" for t in is_.iter("{%s}t" % NS["m"])) if is_ is not None else ""
                elif v is None:
                    val = ""
                elif typ == "s":
                    val = shared[int(v.text)]
                else:
                    val = v.text
                cells[col_index(ref)] = val
            if cells:
                width = max(cells) + 1
                rows.append([cells.get(i, "") for i in range(width)])
        width = max((len(r) for r in rows), default=0)
        with open(os.path.join(outdir, f"{name}.csv"), "w", newline="") as f:
            w = csv.writer(f)
            for r in rows:
                w.writerow(r + [""] * (width - len(r)))
        print(f"{name}: {len(rows)-1} data rows, {width} cols")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
