"""Generate the committed gold-analytics fixture TSV (run once; commit
the output). Usage: python tools/make_gold_fixture.py

Design constraints (plans/gold_oracle_queries.py relies on ALL of them —
regenerate only together with its oracle SQL):

- Non-ASCII characters come from a CLOSED inventory the DuckDB oracle
  folds with explicit replace() chains (NFKC/NFD have no DuckDB
  equivalent): accents that NFD-decompose to ASCII, the NFKC-compat
  TM sign, and the NFD-resistant right single quote (deleted).
- No tabs / double quotes / newlines inside values (CSV-dialect parity).
- Duplicate codes always get DISTINCT last_modified_t per version, so
  the keep-latest tiebreaker (xxhash64, not SQL-replicable) never
  fires; garbage timestamps only on codes with a single version.
- Numeric literals avoid exact round-half ties at 1 decimal
  (completeness 2nd decimal never 5; kcal integral, so kcal*4.184
  cannot tie — 92n = 25 mod 50 has no integer solution; salt/2.5 and
  sodium*2.5 derivations checked tie-free for the emitted values).
- Enough brands with >= 10 products that Q1's HAVING+LIMIT bites.
"""

from __future__ import annotations

import random
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures"

HEADER = (
    "code\tproduct_name\tbrands\tmain_category\tcategories_en\tcategories\t"
    "countries_en\tlast_modified_t\tnutriscore_grade\tenergy-kcal_100g\t"
    "fat_100g\tsaturated-fat_100g\tsugars_100g\tsalt_100g\tproteins_100g\t"
    "fiber_100g\tsodium_100g\tcompleteness\tcreator\tstates_tags\tjunk-col"
)

BRANDS = [
    "Côte d'Or", "Nestlé", "Müller", "Président", "Kellogg's", "Ferrero",
    "Barilla", "Danone", "Lindt", "Bonduelle", "Acme", "Alnatura",
    "Señorío", "Früh™", "unknown", "", "n/a", "La Niña",
]
CATEGORIES = [
    "en:snacks-sweet", "en:beverages-fizzy", "en:dairy-products",
    "fr:pains-speciaux", "en:meals-ready", "en:chocolate-spreads",
    "es:bebidas-frías", "en:breakfast-cereals", "undefined", "",
]
PARENTS = [
    "Snacks", "Beverages", "Dairy", "Breads", "Meals", "Spreads",
    "Cereals", "", "none",
]
COUNTRIES = [
    "France", "Belgium", "España", "Côte d'Ivoire", "Germany",
    "Luxembourg", "Österreich", "United Kingdom", "Sverige", "Brasil",
]
NAMES = [
    "Noir Intense", "Crème Brûlée", "Gaufres™ Maison", "Pâte à Tartiner",
    "Müsli Mix", "Agua Fría", "Chocolat au Lait", "Biscuits Apéro",
    "Jus d'Orange", "Galettes Bretonnes", "Yaourt Nature", "Céréales Choco",
    "Tortilla Niña", "Piñata Snack", "Plain Crackers", "Soda Classic", "",
]
GRADES = ["a", "b", "c", "d", "e", "A", "B", "unknown", "", "null"]


def _num(rng, lo, hi, *, oob=None, garbage=False, ndec=1):
    r = rng.random()
    if garbage and r < 0.03:
        return rng.choice(["abc", "12,5", "NaN"])
    if oob is not None and r < 0.08:
        return oob
    if r < 0.15:
        return ""
    return f"{rng.uniform(lo, hi):.{ndec}f}"


def _completeness(rng):
    if rng.random() < 0.06:
        return "1.4"  # out of bounds -> NULL
    while True:
        v = f"{rng.uniform(0, 1):.2f}"
        if not v.endswith("5"):  # no round-half tie at 1 decimal
            return v


def make_rows(n_products: int = 320, seed: int = 20260814) -> list[str]:
    rng = random.Random(seed)
    base_ts = 1_673_778_600  # 2023-01-15 UTC
    rows = []

    def one(code: str, ts: str, name: str) -> str:
        salt_mode = rng.random()
        salt = _num(rng, 0.1, 3.0) if salt_mode < 0.6 else ""
        sodium = _num(rng, 0.04, 1.2) if salt_mode > 0.3 else ""
        if rng.random() < 0.04:
            salt = f"{rng.uniform(26, 40):.1f}"  # Q5 anomaly: salt > 25
        sugars = _num(rng, 0.0, 60.0, oob="150")
        if rng.random() < 0.04:
            sugars = f"{rng.uniform(81, 99):.1f}"  # Q5 anomaly: sugars > 80
        return "\t".join(
            [
                code,
                name,
                rng.choice(BRANDS),
                rng.choice(CATEGORIES),
                rng.choice(PARENTS),
                rng.choice(PARENTS),  # fallback `categories` column
                ", ".join(
                    rng.sample(COUNTRIES, rng.choice([1, 1, 2, 3]))
                )
                if rng.random() > 0.1
                else rng.choice(["n/a", "", "none"]),
                ts,
                rng.choice(GRADES),
                # integral kcal: kcal*4.184 then cannot tie at 1 decimal
                # (92n = 25 mod 50 has no integer solution)
                _num(rng, 10, 950, oob="5000", garbage=True, ndec=0),
                _num(rng, 0, 95, garbage=True),
                _num(rng, 0, 40),
                sugars,
                salt,
                _num(rng, 0, 80),
                _num(rng, 0, 30),
                sodium,
                _completeness(rng),
                "generator",  # distractor cols (P1 must drop them)
                "en:to-be-checked",
                "zzz",
            ]
        )

    for i in range(n_products):
        code = f"{3000000 + i:09d}"
        name = rng.choice(NAMES)
        r = rng.random()
        if r < 0.12:  # duplicate code: 2-3 versions, distinct ts
            n_ver = rng.choice([2, 2, 3])
            ts0 = base_ts + rng.randrange(0, 55_000_000)
            for v in range(n_ver):
                rows.append(
                    one(code, str(ts0 + (v + 1) * 86_400), rng.choice(NAMES))
                )
        elif r < 0.15:  # garbage / missing timestamp (single version)
            rows.append(one(code, rng.choice(["", "not_a_ts"]), name))
        else:
            rows.append(one(code, str(base_ts + rng.randrange(0, 55_000_000)), name))
    for k in range(6):  # rejected keys
        rows.append(one(rng.choice(["", "null"]), str(base_ts + k), "Reject Me"))
    rng.shuffle(rows)
    return rows


def main() -> int:
    OUT.mkdir(parents=True, exist_ok=True)
    path = OUT / "openfoodfacts_fixture.tsv"
    rows = make_rows()
    path.write_text(HEADER + "\n" + "\n".join(rows) + "\n", encoding="utf-8")
    print(f"wrote {path} ({len(rows)} data rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
