package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Market-basket association mining and declarative data-quality
  * expectations — the last two classic OLAP surfaces missing from the
  * registry. Both are single-shuffle shapes: basket pairs meet on the
  * basket key, expectations evaluate as ONE conditional-count pass.
  */
object BasketQueries {

  /** q142 — association rules over order baskets (the brands an order
    * touches, via lineitem→part): pair support, confidence(a→b), and
    * lift, top-20 by lift among pairs with support ≥ 50. Pair
    * generation is a self-join on the basket key — at 100 TB its cost
    * is Σ|basket|², bounded by basket size (≤25 brands), never by
    * table size; everything downstream is integer arithmetic, so the
    * ranking is bit-deterministic across engines (ties broken by
    * brand names).
    */
  val q142AssociationRules = GQuery(
    "q142_association_rules",
    (s, d) => {
      import s.implicits._
      val items = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), $"l_partkey" === $"p_partkey")
        .select($"l_orderkey".as("bid"), $"p_brand".as("item"))
        .distinct()
      val n = items.select($"bid").distinct().agg(count(lit(1)).as("n_baskets"))
      val itemN = items.groupBy($"item").agg(count(lit(1)).as("n_item"))
      val pairs = items.select($"bid", $"item".as("a"))
        .join(items.select($"bid", $"item".as("b")), Seq("bid"))
        .where($"a" < $"b")
        .groupBy($"a", $"b").agg(count(lit(1)).as("support"))
        .where($"support" >= 50)
      pairs
        .join(broadcast(itemN.select($"item".as("a"), $"n_item".as("n_a"))), Seq("a"))
        .join(broadcast(itemN.select($"item".as("b"), $"n_item".as("n_b"))), Seq("b"))
        .crossJoin(broadcast(n))
        .withColumn("lift",
          $"n_baskets".cast("double") * $"support".cast("double") /
            ($"n_a".cast("double") * $"n_b".cast("double")))
        .orderBy($"lift".desc, $"a", $"b")
        .limit(20)
        .select($"a", $"b", $"support",
          round($"support".cast("double") / $"n_a".cast("double"), 6).as("confidence"),
          round($"lift", 6).as("lift"))
    },
    Some("""WITH items AS (
           |  SELECT DISTINCT l_orderkey AS bid, p_brand AS item
           |  FROM lineitem JOIN part ON l_partkey = p_partkey),
           |n AS (SELECT count(DISTINCT bid) AS n_baskets FROM items),
           |itemn AS (SELECT item, count(*) AS n_item FROM items GROUP BY item),
           |pairs AS (
           |  SELECT x.item AS a, y.item AS b, count(*) AS support
           |  FROM items x JOIN items y ON x.bid = y.bid AND x.item < y.item
           |  GROUP BY a, b HAVING count(*) >= 50),
           |scored AS (
           |  SELECT a, b, support,
           |         CAST(support AS DOUBLE) / CAST(na.n_item AS DOUBLE) AS confidence,
           |         CAST(n_baskets AS DOUBLE) * CAST(support AS DOUBLE) /
           |           (CAST(na.n_item AS DOUBLE) * CAST(nb.n_item AS DOUBLE)) AS lift
           |  FROM pairs
           |  JOIN itemn na ON na.item = a
           |  JOIN itemn nb ON nb.item = b
           |  CROSS JOIN n)
           |SELECT a, b, support, round(confidence, 6) AS confidence, round(lift, 6) AS lift
           |FROM scored ORDER BY lift DESC, a, b LIMIT 20""".stripMargin))

  /** q143 — declarative data-quality expectations: a rule table
    * (not-null, uniqueness, range, set membership, regex shape)
    * evaluated over orders in a single aggregation pass — one scan, no
    * matter how many rules — then exploded to one report row per rule.
    * The reference's scattered PK/quality checks
    * (transformer_data.py:246-258, loader checks) generalized into the
    * expectations-suite shape.
    */
  val q143Expectations = GQuery(
    "q143_expectations",
    (s, d) => {
      import s.implicits._
      val checks = Tables.orders(s, d).agg(
        count(when($"o_orderkey".isNull, 1)).as("v_key_null"),
        (count(lit(1)) - countDistinct($"o_orderkey")).as("v_key_dup"),
        count(when($"o_totalprice" < 0 || $"o_totalprice" > 1000000.0, 1))
          .as("v_price_range"),
        count(when(!$"o_orderstatus".isin("O", "F", "P"), 1)).as("v_status_set"),
        count(when(!$"o_orderpriority".rlike("^[1-5]-"), 1)).as("v_priority_shape"),
        count(when($"o_orderdate".cast("date") < lit("1992-01-01").cast("date") ||
          $"o_orderdate".cast("date") >= lit("2003-01-01").cast("date"), 1))
          .as("v_date_range"))
      checks.select(explode(array(
          struct(lit("key_not_null").as("rule"), $"v_key_null".as("n_violations")),
          struct(lit("key_unique").as("rule"), $"v_key_dup".as("n_violations")),
          struct(lit("price_in_range").as("rule"), $"v_price_range".as("n_violations")),
          struct(lit("status_in_set").as("rule"), $"v_status_set".as("n_violations")),
          struct(lit("priority_shape").as("rule"), $"v_priority_shape".as("n_violations")),
          struct(lit("date_in_range").as("rule"), $"v_date_range".as("n_violations"))))
          .as("r"))
        .select($"r.rule".as("rule"), $"r.n_violations".as("n_violations"),
          ($"r.n_violations" === 0L).as("pass"))
        .orderBy($"rule")
    },
    Some("""WITH checks AS (
           |  SELECT
           |    count(*) FILTER (WHERE o_orderkey IS NULL) AS v_key_null,
           |    count(*) - count(DISTINCT o_orderkey) AS v_key_dup,
           |    count(*) FILTER (WHERE o_totalprice < 0 OR o_totalprice > 1000000.0)
           |      AS v_price_range,
           |    count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS v_status_set,
           |    count(*) FILTER (WHERE NOT regexp_matches(o_orderpriority, '^[1-5]-'))
           |      AS v_priority_shape,
           |    count(*) FILTER (WHERE CAST(o_orderdate AS DATE) < DATE '1992-01-01'
           |                        OR CAST(o_orderdate AS DATE) >= DATE '2003-01-01')
           |      AS v_date_range
           |  FROM orders)
           |SELECT rule, n_violations, n_violations = 0 AS pass FROM (
           |  SELECT 'key_not_null' AS rule, v_key_null AS n_violations FROM checks
           |  UNION ALL SELECT 'key_unique', v_key_dup FROM checks
           |  UNION ALL SELECT 'price_in_range', v_price_range FROM checks
           |  UNION ALL SELECT 'status_in_set', v_status_set FROM checks
           |  UNION ALL SELECT 'priority_shape', v_priority_shape FROM checks
           |  UNION ALL SELECT 'date_in_range', v_date_range FROM checks)
           |ORDER BY rule""".stripMargin))

  val all: Seq[GQuery] = Seq(q142AssociationRules, q143Expectations)
}
