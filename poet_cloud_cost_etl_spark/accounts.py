"""Account registry as a first-class broadcastable dimension.

The reference keeps a hardcoded dict of 27 accounts
(``/root/reference/src/accounts.py:3-52``) and compiles it driver-side
into IN-list / equality WHERE fragments
(``/root/reference/src/sources/aws_cur.py:77-118``). Here the registry
is a tiny DataFrame (broadcast join, J1) *and* we keep the predicate
compilers (P3-P6) because a pushed-down filter beats even a broadcast
join when only the filter is needed.

The fixture analog: ``customer``/``events.user_id`` play the account
role; a region restriction maps to ``c_nationkey``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import reduce
from operator import or_

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Account:
    account_id: str
    name: str
    region: str | None = None  # None = unrestricted (all regions)


@dataclass
class AccountRegistry:
    accounts: list[Account] = field(default_factory=list)

    @classmethod
    def scoped(cls, default: list[Account], ids) -> "AccountRegistry":
        """Restrict to the given account ids; empty/None = all
        (the single definition of the scoping rule)."""
        wanted = {str(a).strip() for a in ids or () if str(a).strip()}
        if wanted:
            return cls([a for a in default if a.account_id in wanted])
        return cls(list(default))

    @classmethod
    def from_env(cls, default: list[Account]) -> "AccountRegistry":
        """TEST_ACCOUNTS scoping (reference accounts.py:54-64)."""
        raw = os.environ.get("TEST_ACCOUNTS", "")
        return cls.scoped(default, raw.split(","))

    def account_ids(self) -> list[str]:
        return [a.account_id for a in self.accounts]

    def get_account_name(self, account_id: str) -> str | None:
        """Reference accounts.py:66-68."""
        for a in self.accounts:
            if a.account_id == account_id:
                return a.name
        return None

    def to_df(self, spark: SparkSession) -> DataFrame:
        """The registry as a broadcastable dim table (J1)."""
        return spark.createDataFrame(
            [(a.account_id, a.name, a.region) for a in self.accounts],
            "account_id string, account_name string, region_restriction string",
        )

    # ---- predicate compilers (P3-P6), mirroring aws_cur.py:77-118 ----

    def in_list_predicate(self, account_col: Column) -> Column | None:
        """P3: unrestricted accounts → IN-list."""
        ids = [a.account_id for a in self.accounts if a.region is None]
        return account_col.isin(ids) if ids else None

    def region_predicates(self, account_col: Column, region_col: Column) -> Column | None:
        """P4/P5: OR of (account==X AND region==Y) conjunctions."""
        conds = [
            (account_col == a.account_id) & (region_col == a.region)
            for a in self.accounts
            if a.region is not None
        ]
        return reduce(or_, conds) if conds else None

    def where(self, account_col: Column, region_col: Column) -> Column | None:
        """P6: full WHERE composition (aws_cur.py:94-118)."""
        parts = [
            p
            for p in (
                self.in_list_predicate(account_col),
                self.region_predicates(account_col, region_col),
            )
            if p is not None
        ]
        return reduce(or_, parts) if parts else None


def broadcast_dim(df: DataFrame) -> DataFrame:
    """Explicit broadcast hint for small dimension tables (J1)."""
    return F.broadcast(df)
