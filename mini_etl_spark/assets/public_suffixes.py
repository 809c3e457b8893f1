"""Vendored snapshot (subset) of the Public Suffix List.

The PSL (publicsuffix.org — public data, Mozilla-maintained) is the
canonical answer to "under which suffix do people register domains?",
which decides the registrable-domain grouping key: ``example.co.uk``
registers under ``co.uk``, so ``a.b.example.co.uk`` groups as
``example.co.uk``, not ``co.uk``.

What is bundled and why it is enough for the default path:

- **Single-label TLDs need no entry.** ``with_registered_domain`` falls
  back to the last-two-labels rule for unmatched hosts, which is exactly
  right for every plain TLD (``example.com`` → ``example.com``). Only
  MULTI-LABEL suffixes change the answer, so only those are listed.
- **ICANN section**: the widely-used country second-level zones
  (``co.uk``-class) for the countries that dominate real crawl traffic.
- **Private section** (optional, on by default): hosting platforms where
  each subdomain is an independent site (``github.io``,
  ``blogspot.com`` …) — for dedup/caps you almost always want
  ``user.github.io`` treated as its own "domain", which is precisely the
  PSL private-section semantics.

This is a curated SUBSET (~230 rules), not the full ~10k-rule list, and
it interprets neither wildcard (``*.ck``) nor exception (``!www.ck``)
rules. For full-PSL exactness, download the list and load it with
:func:`load_psl_file` — the result plugs into the same broadcast-join
operator. The snapshot is static public data; there is nothing
proprietary about its contents.
"""

from __future__ import annotations

__all__ = ["ICANN_MULTI_SUFFIXES", "PRIVATE_SUFFIXES", "public_suffixes", "load_psl_file"]

# ICANN-section multi-label public suffixes (registrations happen one
# label below these). Grouped by country code, alphabetical.
ICANN_MULTI_SUFFIXES: list[str] = [
    # Argentina
    "com.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar", "mil.ar", "net.ar", "org.ar",
    # Australia
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    # Bangladesh
    "ac.bd", "com.bd", "edu.bd", "gov.bd", "net.bd", "org.bd",
    # Bolivia
    "com.bo", "edu.bo", "gob.bo", "net.bo", "org.bo",
    # Botswana
    "ac.bw", "co.bw", "org.bw",
    # Brazil
    "com.br", "edu.br", "gov.br", "mil.br", "net.br", "org.br",
    # China
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    # Colombia
    "com.co", "edu.co", "gov.co", "mil.co", "net.co", "org.co",
    # Costa Rica
    "ac.cr", "co.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
    # Cuba
    "com.cu", "edu.cu", "gov.cu", "net.cu", "org.cu",
    # Algeria
    "com.dz", "edu.dz", "gov.dz", "net.dz", "org.dz",
    # Ecuador
    "com.ec", "edu.ec", "fin.ec", "gob.ec", "gov.ec", "net.ec", "org.ec",
    # Egypt
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "net.eg", "org.eg", "sci.eg",
    # Ethiopia
    "biz.et", "com.et", "edu.et", "gov.et", "info.et", "name.et", "net.et", "org.et",
    # Ghana
    "com.gh", "edu.gh", "gov.gh", "mil.gh", "org.gh",
    # Guatemala
    "com.gt", "edu.gt", "gob.gt", "ind.gt", "mil.gt", "net.gt", "org.gt",
    # Hong Kong
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    # Honduras
    "com.hn", "edu.hn", "gob.hn", "mil.hn", "net.hn", "org.hn",
    # Indonesia
    "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
    "net.id", "or.id", "ponpes.id", "sch.id", "web.id",
    # Israel
    "ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il", "net.il", "org.il",
    # India
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "mil.in", "net.in", "nic.in", "org.in", "res.in",
    # Japan
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp", "ne.jp", "or.jp",
    # Kenya
    "ac.ke", "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke", "ne.ke",
    "or.ke", "sc.ke",
    # South Korea
    "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr",
    "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr",
    # Morocco
    "ac.ma", "co.ma", "gov.ma", "net.ma", "org.ma", "press.ma",
    # Mexico
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    # Malaysia
    "com.my", "edu.my", "gov.my", "mil.my", "name.my", "net.my", "org.my",
    # Namibia
    "alt.na", "co.na", "com.na", "org.na",
    # Nigeria
    "com.ng", "edu.ng", "gov.ng", "mil.ng", "mobi.ng", "name.ng", "net.ng",
    "org.ng", "sch.ng",
    # Nicaragua
    "ac.ni", "biz.ni", "co.ni", "com.ni", "edu.ni", "gob.ni", "net.ni", "org.ni",
    # New Zealand
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "health.nz",
    "iwi.nz", "kiwi.nz", "maori.nz", "mil.nz", "net.nz", "org.nz",
    "parliament.nz", "school.nz",
    # Panama
    "abo.pa", "ac.pa", "com.pa", "edu.pa", "gob.pa", "ing.pa", "med.pa",
    "net.pa", "nom.pa", "org.pa", "sld.pa",
    # Peru
    "com.pe", "edu.pe", "gob.pe", "mil.pe", "net.pe", "nom.pe", "org.pe",
    # Philippines
    "com.ph", "edu.ph", "gov.ph", "i.ph", "mil.ph", "net.ph", "ngo.ph", "org.ph",
    # Pakistan
    "biz.pk", "com.pk", "edu.pk", "fam.pk", "gob.pk", "gov.pk", "net.pk",
    "org.pk", "web.pk",
    # Poland
    "biz.pl", "com.pl", "edu.pl", "gov.pl", "info.pl", "mil.pl", "net.pl",
    "org.pl", "waw.pl",
    # Paraguay
    "com.py", "coop.py", "edu.py", "gov.py", "mil.py", "net.py", "org.py",
    # Saudi Arabia
    "com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa", "pub.sa", "sch.sa",
    # Singapore
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg",
    # El Salvador
    "com.sv", "edu.sv", "gob.sv", "org.sv", "red.sv",
    # Thailand
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    # Tunisia
    "com.tn", "ens.tn", "fin.tn", "gov.tn", "ind.tn", "info.tn", "intl.tn",
    "nat.tn", "net.tn", "org.tn", "perso.tn", "tourism.tn",
    # Turkey
    "av.tr", "bbs.tr", "bel.tr", "biz.tr", "com.tr", "dr.tr", "edu.tr",
    "gen.tr", "gov.tr", "info.tr", "k12.tr", "kep.tr", "mil.tr", "name.tr",
    "net.tr", "org.tr", "pol.tr", "tel.tr", "tsk.tr", "tv.tr", "web.tr",
    # Taiwan
    "club.tw", "com.tw", "ebiz.tw", "edu.tw", "game.tw", "gov.tw",
    "idv.tw", "mil.tw", "net.tw", "org.tw",
    # Tanzania
    "ac.tz", "co.tz", "go.tz", "hotel.tz", "info.tz", "me.tz", "mil.tz",
    "mobi.tz", "ne.tz", "or.tz", "sc.tz", "tv.tz",
    # Ukraine
    "biz.ua", "co.ua", "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    # Uganda
    "ac.ug", "co.ug", "com.ug", "go.ug", "ne.ug", "or.ug", "org.ug", "sc.ug",
    # United Kingdom
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "sch.uk",
    # Uruguay
    "com.uy", "edu.uy", "gub.uy", "mil.uy", "net.uy", "org.uy",
    # Venezuela
    "arts.ve", "bib.ve", "co.ve", "com.ve", "e12.ve", "edu.ve", "firm.ve",
    "gob.ve", "gov.ve", "info.ve", "int.ve", "mil.ve", "net.ve", "org.ve",
    "rec.ve", "store.ve", "tec.ve", "web.ve",
    # Vietnam
    "ac.vn", "biz.vn", "com.vn", "edu.vn", "gov.vn", "health.vn", "info.vn",
    "int.vn", "name.vn", "net.vn", "org.vn", "pro.vn",
    # South Africa
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za", "net.za",
    "nom.za", "org.za", "school.za", "web.za",
    # Zambia / Zimbabwe
    "ac.zm", "biz.zm", "co.zm", "com.zm", "edu.zm", "gov.zm", "info.zm",
    "mil.zm", "net.zm", "org.zm", "sch.zm",
    "ac.zw", "co.zw", "gov.zw", "mil.zw", "org.zw",
]

# Private-section suffixes: hosting platforms where each subdomain is an
# independently-controlled site. Grouping by registered domain with
# these included keeps `alice.github.io` and `bob.github.io` apart — the
# behavior you want for per-site caps and host-level dedup.
PRIVATE_SUFFIXES: list[str] = [
    "amazonaws.com", "appspot.com", "azurewebsites.net", "blogspot.com",
    "cloudfront.net", "fastly.net", "firebaseapp.com", "github.io",
    "gitlab.io", "herokuapp.com", "netlify.app", "pages.dev",
    "readthedocs.io", "s3.amazonaws.com", "vercel.app", "web.app",
    "workers.dev", "wordpress.com",
]


def public_suffixes(include_private: bool = True) -> list[str]:
    """The bundled multi-label suffix snapshot as a sorted list, ready
    for ``with_registered_domain`` / ``filter_url_blocklist``'s broadcast
    suffix join. ``include_private=False`` restricts to ICANN zones
    (treat ``alice.github.io`` as part of ``github.io`` rather than as
    its own site)."""
    out = set(ICANN_MULTI_SUFFIXES)
    if include_private:
        out |= set(PRIVATE_SUFFIXES)
    return sorted(out)


def load_psl_file(path: str, include_private: bool = True) -> list[str]:
    """Parse a full ``public_suffix_list.dat`` (the publicsuffix.org
    download format) into the literal-suffix list the broadcast join
    consumes. Handles comments, blank lines and the ICANN/private
    section markers; wildcard rules (``*.ck``) contribute their BASE
    (``ck``) and exception rules (``!www.ck``) are skipped — the
    literal matcher cannot express either exactly (documented in
    ``with_registered_domain``). Single-label rules are kept (harmless:
    the join requires a label above the suffix, which reproduces the
    two-label fallback for them)."""
    out: set[str] = set()
    private = False
    with open(path, encoding="utf-8") as fh:
        for raw in fh:
            line = raw.strip()
            if not line or line.startswith("//"):
                if "===BEGIN PRIVATE DOMAINS===" in line:
                    private = True
                continue
            if private and not include_private:
                continue
            if line.startswith("!"):
                continue  # exception rule — not expressible literally
            if line.startswith("*."):
                line = line[2:]  # wildcard base: closest literal reading
            if line:
                out.add(line.lower())
    return sorted(out)
