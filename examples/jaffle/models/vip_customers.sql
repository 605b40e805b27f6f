SELECT co.customer_id, c.c_name, co.total_spent
FROM {{ ref('customer_orders') }} co
JOIN {{ source('warehouse', 'customer') }} c
  ON co.customer_id = c.c_custkey
WHERE co.total_spent > 1000000
