SELECT CAST(event_type AS VARCHAR) AS event_type, CAST(n AS BIGINT) AS n, CAST(approx_users AS BIGINT) AS approx_users, CAST(approx_p50 AS DOUBLE) AS approx_p50, CAST(approx_p95 AS DOUBLE) AS approx_p95 FROM (VALUES
  ('click', 2006, 150, 35.28, 152.04),
  ('error', 2014, 150, 34.38, 143.52),
  ('purchase', 1981, 150, 33.95, 142.5),
  ('signup', 2017, 150, 35.92, 151.77),
  ('view', 1982, 150, 33.83, 143.8)
) AS golden(event_type, n, approx_users, approx_p50, approx_p95)
