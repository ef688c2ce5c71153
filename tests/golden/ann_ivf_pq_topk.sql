SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(score AS DOUBLE) AS score FROM (VALUES
  (0, 1.0),
  (365, 0.369994),
  (387, 0.331139),
  (7, 0.292842),
  (464, 0.276628),
  (483, 0.2567),
  (165, 0.244895),
  (415, 0.237975),
  (229, 0.2302),
  (261, 0.205152)
) AS golden(vec_id, score)
