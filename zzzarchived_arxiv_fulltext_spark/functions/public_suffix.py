"""Minimal public-suffix snapshot for registrable-domain keying.

The publicsuffix.org list (Mozilla-maintained, public domain-ish MPL)
is the standard answer to "what is a site?" on the web: ``a.co.uk``
and ``b.co.uk`` are DIFFERENT registrable domains even though the
naive last-two-labels rule collapses them into ``co.uk``. Domain
blocklists, per-domain caps, and link-graph keys that use the naive
rule mis-key every ccTLD site (VERDICT r5 #4).

This is a deliberately small snapshot of the highest-traffic entries
(the full list is ~9k rules and drifts weekly — bundling it verbatim
would rot): the multi-label ccTLD registries that dominate crawl
volume plus the hosted-platform entries from the PRIVATE section
(``github.io`` etc., where each subdomain is an independent site).
Operators accept ``extra_suffixes`` so a deployment can pass the full
current list (or org-specific internal zones) without code changes;
unknown suffixes safely degrade to the last-two-labels rule.

Suffix semantics: the registrable domain is one label more than the
longest matching public suffix. Only exact-label suffixes are modeled
(no ``*.ck`` wildcard / ``!www.ck`` exception rules — both vanishingly
rare in crawl data and they also degrade safely).
"""

# two-label public suffixes: registrable domain = last THREE labels
PUBLIC_SUFFIXES_2 = (
    # United Kingdom
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "sch.uk", "me.uk",
    "ltd.uk", "plc.uk", "nhs.uk",
    # Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz", "school.nz",
    # Japan / Korea / China / Taiwan / Hong Kong / SE Asia
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    "co.kr", "ne.kr", "or.kr", "re.kr", "ac.kr", "go.kr", "pe.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "org.hk", "edu.hk", "gov.hk", "net.hk", "idv.hk",
    "com.sg", "org.sg", "edu.sg", "gov.sg", "net.sg", "per.sg",
    "com.my", "org.my", "edu.my", "gov.my", "net.my",
    "co.id", "or.id", "ac.id", "go.id", "web.id", "sch.id", "my.id",
    "com.ph", "org.ph", "net.ph", "gov.ph", "edu.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "co.th", "or.th", "ac.th", "go.th", "in.th", "net.th",
    "com.np", "org.np", "edu.np", "gov.np", "net.np",
    "com.bd", "org.bd", "edu.bd", "gov.bd", "net.bd", "ac.bd",
    "com.pk", "org.pk", "edu.pk", "gov.pk", "net.pk", "ac.pk",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "nic.in",
    "com.lk", "org.lk", "edu.lk", "gov.lk",
    # Middle East
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "com.tr", "org.tr", "net.tr", "edu.tr", "gov.tr", "av.tr", "k12.tr",
    "com.sa", "org.sa", "edu.sa", "gov.sa", "net.sa", "med.sa",
    "com.eg", "org.eg", "edu.eg", "gov.eg", "net.eg", "sci.eg",
    "com.ae", "org.ae", "net.ae", "ac.ae", "gov.ae", "sch.ae",
    "com.kw", "org.kw", "edu.kw", "gov.kw",
    "com.qa", "org.qa", "edu.qa", "gov.qa", "net.qa",
    "com.om", "org.om", "edu.om", "gov.om",
    "com.lb", "org.lb", "edu.lb", "gov.lb", "net.lb",
    "com.jo", "org.jo", "edu.jo", "gov.jo", "net.jo",
    # Americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br",
    "adv.br", "ind.br", "inf.br", "eco.br", "blog.br",
    "com.mx", "org.mx", "net.mx", "edu.mx", "gob.mx",
    "com.ar", "org.ar", "net.ar", "edu.ar", "gob.ar", "int.ar",
    "com.co", "org.co", "net.co", "edu.co", "gov.co", "nom.co",
    "com.pe", "org.pe", "net.pe", "edu.pe", "gob.pe", "nom.pe",
    "com.ve", "org.ve", "net.ve", "edu.ve", "gob.ve", "web.ve",
    "com.ec", "org.ec", "net.ec", "edu.ec", "gob.ec", "fin.ec",
    "com.uy", "org.uy", "net.uy", "edu.uy", "gub.uy",
    "com.do", "org.do", "net.do", "edu.do", "gob.do", "web.do",
    "com.gt", "org.gt", "net.gt", "edu.gt", "gob.gt", "ind.gt",
    "com.py", "org.py", "net.py", "edu.py", "gov.py", "una.py",
    "com.bo", "org.bo", "net.bo", "edu.bo", "gob.bo",
    "com.ni", "org.ni", "net.ni", "edu.ni", "gob.ni",
    "com.sv", "org.sv", "edu.sv", "gob.sv",
    "com.hn", "org.hn", "net.hn", "edu.hn", "gob.hn",
    "com.pa", "org.pa", "net.pa", "edu.pa", "gob.pa",
    # Africa
    "co.za", "org.za", "net.za", "web.za", "ac.za", "gov.za",
    "co.ke", "or.ke", "ne.ke", "ac.ke", "go.ke", "sc.ke",
    "co.tz", "or.tz", "ac.tz", "go.tz", "ne.tz", "sc.tz",
    "co.ug", "or.ug", "ac.ug", "go.ug", "ne.ug", "sc.ug",
    "co.zw", "org.zw", "ac.zw", "gov.zw",
    "com.ng", "org.ng", "net.ng", "edu.ng", "gov.ng", "sch.ng",
    "com.gh", "org.gh", "edu.gh", "gov.gh",
    "com.et", "org.et", "edu.et", "gov.et", "name.et",
    # Europe (multi-label registries)
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua", "kiev.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
    "com.gr", "org.gr", "net.gr", "edu.gr", "gov.gr",
    "com.pt", "org.pt", "edu.pt", "gov.pt", "net.pt",
    "com.ro", "org.ro", "nom.ro", "info.ro",
    "co.at", "or.at", "ac.at", "gv.at", "priv.at",
    "co.hu", "org.hu", "info.hu", "priv.hu",
    # hosted platforms (PSL private section): every subdomain is an
    # independent site — critical for per-domain caps on crawl data
    "github.io", "gitlab.io", "blogspot.com", "appspot.com",
    "herokuapp.com", "netlify.app", "vercel.app", "pages.dev",
    "web.app", "firebaseapp.com", "azurewebsites.net", "cloudfront.net",
    "wordpress.com", "weebly.com", "wixsite.com", "neocities.org",
    "readthedocs.io", "sourceforge.io",
)

# three-label public suffixes: registrable domain = last FOUR labels
PUBLIC_SUFFIXES_3 = (
    "s3.amazonaws.com", "compute.amazonaws.com", "elb.amazonaws.com",
)


def registrable_domain(host: str, extra_suffixes=()) -> str:
    """Pure-Python twin of the Spark expression (tests + oracles):
    longest matching public suffix plus one label; naive last-two
    fallback; single-label hosts return themselves."""
    labels = host.lower().split(".")
    extra2 = tuple(s for s in extra_suffixes if s.count(".") == 1)
    extra3 = tuple(s for s in extra_suffixes if s.count(".") == 2)
    if len(labels) >= 4 and \
            ".".join(labels[-3:]) in PUBLIC_SUFFIXES_3 + extra3:
        return ".".join(labels[-4:])
    if len(labels) >= 3 and \
            ".".join(labels[-2:]) in PUBLIC_SUFFIXES_2 + extra2:
        return ".".join(labels[-3:])
    if len(labels) >= 2:
        return ".".join(labels[-2:])
    return host.lower()
