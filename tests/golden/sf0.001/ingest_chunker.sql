SELECT CAST(doc AS VARCHAR) AS doc, CAST(chunk_idx AS BIGINT) AS chunk_idx, CAST(text AS VARCHAR) AS text, CAST(page_num AS INTEGER) AS page_num, CAST(heading_path AS VARCHAR) AS heading_path, CAST(heading_level AS INTEGER) AS heading_level, CAST(chunk_type AS VARCHAR) AS chunk_type, CAST(sentence_count AS INTEGER) AS sentence_count, CAST(list_type AS VARCHAR) AS list_type, CAST(list_length AS INTEGER) AS list_length FROM (VALUES
  ('Brand#1', 0, 'Quarterly Report Draft
blue anvil
blue rod
hot gear
- old widget
Quarterly Report Draft', 2, 'blue anvil', 0, 'text', 1, '', 0),
  ('Brand#10', 0, 'Quarterly Report Draft
cold rod
cold plate
new ring
- small widget
Quarterly Report Draft
large gizmo
red bolt', 2, 'cold rod > large gizmo', 0, 'text', 1, '', 0),
  ('Brand#11', 0, 'Quarterly Report Draft
old ring
red plate
hot gear
- red gear
Quarterly Report Draft
large gear
red gizmo
hot rod', 2, 'old ring > large gear', 0, 'text', 1, '', 0),
  ('Brand#12', 0, 'Quarterly Report Draft
hot plate
old plate
hot anvil
- hot anvil
Quarterly Report Draft
cold widget
new anvil', 2, 'hot plate > cold widget', 0, 'text', 1, '', 0),
  ('Brand#13', 0, 'Quarterly Report Draft
large ring
blue ring
new anvil
- old bolt
Quarterly Report Draft
blue gizmo
hot bolt
small ring
- hot rod', 2, 'large ring > blue gizmo', 0, 'text', 1, '', 0),
  ('Brand#14', 0, 'Quarterly Report Draft
new widget
large bolt
new gear
- hot ring
Quarterly Report Draft
cold anvil', 2, 'new widget > cold anvil', 0, 'text', 1, '', 0),
  ('Brand#15', 0, 'Quarterly Report Draft
large gear
blue widget
cold gizmo
- hot widget', 1, 'large gear', 0, 'text', 1, '', 0),
  ('Brand#16', 0, 'Quarterly Report Draft
cold rod
red gizmo
blue bolt
- cold gizmo
Quarterly Report Draft
small plate
large gear
red gizmo', 2, 'cold rod > small plate', 0, 'text', 1, '', 0),
  ('Brand#17', 0, 'Quarterly Report Draft
old rod
new bolt
large anvil
- cold gear
Quarterly Report Draft
red anvil
cold rod', 2, 'old rod > red anvil', 0, 'text', 1, '', 0),
  ('Brand#18', 0, 'Quarterly Report Draft
old anvil
cold ring
blue rod
- hot gear
Quarterly Report Draft
old bolt
new gear', 2, 'old anvil > old bolt', 0, 'text', 1, '', 0),
  ('Brand#19', 0, 'Quarterly Report Draft
cold rod
hot rod
cold anvil
- hot anvil
Quarterly Report Draft
cold bolt
red gear
red bolt', 2, 'cold rod > cold bolt', 0, 'text', 1, '', 0),
  ('Brand#2', 0, 'Quarterly Report Draft
hot gizmo
red anvil
large anvil
- cold ring', 1, 'hot gizmo', 0, 'text', 1, '', 0),
  ('Brand#20', 0, 'Quarterly Report Draft
blue ring
new gizmo
old plate
- small widget
Quarterly Report Draft', 2, 'blue ring', 0, 'text', 1, '', 0),
  ('Brand#21', 0, 'Quarterly Report Draft
new plate
old plate
large anvil
- cold gear
Quarterly Report Draft', 2, 'new plate', 0, 'text', 1, '', 0),
  ('Brand#22', 0, 'Quarterly Report Draft
new gear
old widget
red ring
- cold gear
Quarterly Report Draft
large plate
new rod
red rod
- small gizmo', 2, 'new gear > large plate', 0, 'text', 1, '', 0),
  ('Brand#23', 0, 'Quarterly Report Draft
blue widget
hot widget
old plate
- new bolt
Quarterly Report Draft', 2, 'blue widget', 0, 'text', 1, '', 0),
  ('Brand#24', 0, 'Quarterly Report Draft
hot rod
cold anvil
new bolt
- large gizmo
Quarterly Report Draft', 2, 'hot rod', 0, 'text', 1, '', 0),
  ('Brand#25', 0, 'Quarterly Report Draft
blue rod
hot widget
hot gear
- blue ring
Quarterly Report Draft
new gear
blue rod
red anvil
- new gizmo', 2, 'blue rod > new gear', 0, 'text', 1, '', 0),
  ('Brand#3', 0, 'Quarterly Report Draft
small gear
new gear
old gear
- old rod', 1, 'small gear', 0, 'text', 1, '', 0),
  ('Brand#4', 0, 'Quarterly Report Draft
red anvil
old gizmo
blue ring
- cold bolt
Quarterly Report Draft', 2, 'red anvil', 0, 'text', 1, '', 0),
  ('Brand#5', 0, 'Quarterly Report Draft
cold gear
red plate
hot plate
- cold bolt
Quarterly Report Draft
red gear
cold widget', 2, 'cold gear > red gear', 0, 'text', 1, '', 0),
  ('Brand#6', 0, 'Quarterly Report Draft
hot widget
blue rod
hot widget', 1, 'hot widget', 0, 'text', 1, '', 0),
  ('Brand#7', 0, 'Quarterly Report Draft
old bolt
red widget
small gizmo
- large gear', 1, 'old bolt', 0, 'text', 1, '', 0),
  ('Brand#8', 0, 'Quarterly Report Draft
small rod
blue bolt
old ring
- hot rod
Quarterly Report Draft
large plate
red gizmo', 2, 'small rod > large plate', 0, 'text', 1, '', 0),
  ('Brand#9', 0, 'Quarterly Report Draft
red plate
old bolt
old widget
- cold bolt', 1, 'red plate', 0, 'text', 1, '', 0)
) AS golden(doc, chunk_idx, text, page_num, heading_path, heading_level, chunk_type, sentence_count, list_type, list_length)
