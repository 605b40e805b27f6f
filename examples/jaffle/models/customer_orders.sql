SELECT o_custkey AS customer_id,
       min(order_date) AS first_order,
       max(order_date) AS most_recent_order,
       count(o_orderkey) AS number_of_orders,
       sum(o_totalprice) AS total_spent
FROM {{ ref('stg_orders') }}
GROUP BY o_custkey
