"""Portal parser registry — one module per reference spider (SURVEY.md §2.5)."""

from importlib import import_module

_PORTALS = {}

_MODULES = {
    "immonet": ".immonet",
    "immoscout": ".immoscout",
    "ebay": ".ebay_klein",
    "kalay": ".kalay",
    "berlin": ".berlin",
    "wohnungsmarkt24": ".wohnungsmarkt24",
    "ohnemakler": ".ohnemakler",
    "sueddeutsche": ".sueddeutsche",
    "wohnungsboerse": ".wohnungsboerse",
    "meinestadt": ".meinestadt",
    "sparkasse": ".sparkasse",
    "wgsuche": ".wgsuche",
    "immowelt": ".immowelt",
}


def get_portal(name: str):
    if name not in _PORTALS:
        if name not in _MODULES:
            raise KeyError(f"portal {name!r} not implemented (have {sorted(_MODULES)})")
        _PORTALS[name] = import_module(_MODULES[name], __package__)
    return _PORTALS[name]


def implemented_portals():
    return sorted(_MODULES)
