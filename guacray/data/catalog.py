"""Deterministic entity catalog: canonical entities + surface aliases.

This is the analog of the identity knowledge GUAC's parsers carry
implicitly (purl spec, vcs forms, vuln-id forms): the mapping from a
mention *surface form* to a canonical identity.  The linker stage holds
the alias→(type, canonical) dict in actor state, like the deps.dev
client's purl cache (/root/reference/internal/client/depsdevclient/
deps_dev_client.go:70,585,618).

Everything is derived from a fixed seed so fixtures and goldens are
reproducible byte-for-byte.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

_FIRST = ["Ada", "Alan", "Grace", "Edsger", "Barbara", "Donald", "John",
          "Leslie", "Tony", "Niklaus", "Frances", "Margaret", "Dennis",
          "Ken", "Bjarne", "Guido", "Tim", "Vint", "Radia", "Shafi"]
_LAST = ["Lovelace", "Turing", "Hopper", "Dijkstra", "Liskov", "Knuth",
         "Backus", "Lamport", "Hoare", "Wirth", "Allen", "Hamilton",
         "Ritchie", "Thompson", "Stroustrup", "Rossum", "Berners",
         "Cerf", "Perlman", "Goldwasser"]
_ORG_A = ["Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne",
          "Wonka", "Tyrell", "Cyberdyne", "Aperture", "Hooli", "Vandelay",
          "Sirius", "Gringotts", "Monarch", "Zenith", "Apex", "Nimbus",
          "Quantum", "Vertex"]
_ORG_B = ["Corp", "Industries", "Labs", "Systems", "Dynamics", "Software",
          "Analytics", "Robotics", "Networks", "Holdings"]
_PROD_A = ["Hyper", "Ultra", "Mega", "Nano", "Turbo", "Prime", "Neo",
           "Omni", "Astro", "Flux"]
_PROD_B = ["Widget", "Engine", "Platform", "Suite", "Core", "Hub",
           "Kit", "Cloud", "Stack", "Box"]
_PLACES = ["Springfield", "Rivertown", "Lakeside", "Hillview", "Brookfield",
           "Fairhaven", "Westbrook", "Eastport", "Northgate", "Southmere",
           "Maplewood", "Cedar Falls", "Oak Ridge", "Pine Valley",
           "Elm Grove", "Ashford", "Birchwood", "Stonebridge", "Claymont",
           "Harborview"]


@dataclass
class Entity:
    etype: str          # person | org | product | place
    canonical: str      # canonical name
    aliases: list[str] = field(default_factory=list)  # includes canonical


@dataclass
class Catalog:
    entities: list[Entity]

    def by_type(self, etype: str) -> list[Entity]:
        return [e for e in self.entities if e.etype == etype]

    def alias_map(self) -> dict[str, tuple[str, str]]:
        """surface alias (lowercased) → (etype, canonical name).

        Built first-wins in catalog order so collisions are deterministic.
        """
        out: dict[str, tuple[str, str]] = {}
        for e in self.entities:
            for a in e.aliases:
                out.setdefault(a.lower(), (e.etype, e.canonical))
        return out


def build_catalog(seed: int = 42) -> Catalog:
    rng = random.Random(seed)
    ents: list[Entity] = []

    for i, (f, l) in enumerate((f, l) for f in _FIRST for l in _LAST):
        if i >= 120:
            break
        # No periods in aliases: the reference sentence splitter breaks on
        # ". " and mid-name periods would (deterministically) mangle cues.
        full = f"{f} {l}"
        aliases = [full, l]
        if rng.random() < 0.3:
            aliases.append(f"Dr {full}")
        ents.append(Entity("person", full, aliases))

    for i, (a, b) in enumerate((a, b) for a in _ORG_A for b in _ORG_B):
        if i >= 80:
            break
        full = f"{a} {b}"
        aliases = [full, a]
        if rng.random() < 0.4:
            aliases.append(f"{a} {b} Inc")
        ents.append(Entity("org", full, aliases))

    for i, (a, b) in enumerate((a, b) for a in _PROD_A for b in _PROD_B):
        if i >= 60:
            break
        full = f"{a}{b}"
        ver = f"{full} {rng.randint(1, 9)}.0"
        ents.append(Entity("product", full, [full, ver]))

    for p in _PLACES:
        ents.append(Entity("place", p, [p]))

    return Catalog(ents)
